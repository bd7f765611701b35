from . import checkpoint, io  # noqa: F401
