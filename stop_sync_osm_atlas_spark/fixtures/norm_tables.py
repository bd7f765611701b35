"""Small broadcast-side lookup tables (FIXTURES.md §3).

The analog of the reference's CSV-driven operator-normalization map
(reference matching_process/org_standardization.py:7-44): tiny, constant,
broadcast to every executor, never shuffled.
"""

from __future__ import annotations

# Per-language marker stopwords. Used both as langid markers and for the
# stopword-density rule. Deterministic, ASCII-only (cross-engine safe).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "with", "on", "for"],
    "de": ["der", "die", "das", "und", "ein", "mit", "auf", "ist", "von", "zu"],
    "fr": ["le", "la", "les", "et", "un", "une", "dans", "est", "avec", "sur"],
    "it": ["il", "la", "di", "e", "un", "una", "con", "per", "sono", "del"],
}

ALL_STOPWORDS: list[str] = sorted({w for ws in STOPWORDS.values() for w in ws})

LANGS: list[str] = sorted(STOPWORDS)

# PII scrub patterns, applied in listed order (order matters: URL before
# bare-id so 'http://x.com/1234567890123456' scrubs as URL first).
# Java regex (Spark) / RE2 (DuckDB) / Python re compatible subset only:
# no lookbehind, no backreferences.
PII_PATTERNS: list[tuple[str, str, str]] = [
    # (kind, pattern, replacement)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    # longid BEFORE phone: a bare 16-digit run is an <ID>, not a phone.
    ("longid", r"\b[0-9]{16}\b", "<ID>"),
    ("phone", r"\+?[0-9][0-9 ()-]{7,}[0-9]", "<PHONE>"),
]

# Toxicity terms (synthetic placeholders — deterministic fixture tokens,
# not real slurs; severity 1 = worst, mirroring the reference's priority
# convention, reference backend/models.py:60).
TOXICITY_TERMS: list[tuple[str, int]] = [
    ("badword1", 1),
    ("badword2", 1),
    ("uglyword", 2),
    ("meanword", 2),
]
