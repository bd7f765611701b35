from . import cascade, dedup, neardup, overrides, rules, scrub, similarity  # noqa: F401
