from . import image, langid, perplexity, phash, text  # noqa: F401
