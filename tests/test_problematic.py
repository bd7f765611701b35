"""T3 problematic-case corpus (FIXTURES.md §5): explicit boundary rows,
multi-rule collisions, corrupt bytes, escalations — the analog of the
reference's problems-table categories
(reference documentation/PROBLEMS_DEFINITIONS.md)."""

from __future__ import annotations

import pandas as pd
import pytest

from stop_sync_osm_atlas_spark.functions.image import encode_image
from stop_sync_osm_atlas_spark.operators.cascade import run_cascade
from stop_sync_osm_atlas_spark.schemas import PAIRS_SCHEMA


def _mk(image_id, caption, w=32, h=32, fmt="png", phash=None, b=...):
    if b is ...:
        b = encode_image(7, w, h, fmt) if fmt in ("png", "jpeg") else None
    if phash is None:
        # unique far-apart hash per row (expected Hamming ~32 pairwise)
        import hashlib

        phash = int.from_bytes(hashlib.md5(image_id.encode()).digest()[:8], "big") >> 1
    return dict(image_id=image_id, bytes=b, w=w, h=h, fmt=fmt, caption=caption, phash=phash)


EN5 = "the train and the station"  # 5 words, en markers, clean
EN20 = ("the train and the station with a bridge on the river for a market "
        "in the village of note")  # 20 words incl. stopwords


CASES = [
    # (row, expected_rule, expected_decision)
    (_mk("t01", EN5), "keep", "keep"),
    (_mk("t02", "the train and station"), "caption_too_short", "drop"),  # 4 words
    (_mk("t03", " ".join(["the"] + ["word"] * 256)), "caption_too_long", "drop"),
    (_mk("t04", "word word word word word word the and"), "repetition", "drop"),
    (_mk("t05", "the station !!! ### $$$ %%%"), "symbol_ratio", "drop"),
    (_mk("t06", " ".join(f"w{i}" for i in range(20))), "low_stopword_density", "drop"),
    (_mk("t07", "zxq vqk pzw jkl mno pqr"), "langid_undetermined", "drop"),
    (_mk("t08", None), "empty_caption", "drop"),
    (_mk("t09", "   "), "empty_caption", "drop"),
    (_mk("t10", EN5, fmt="bmp"), "corrupt_image", "drop"),
    (_mk("t11", EN5, w=0), "corrupt_image", "drop"),
    (_mk("t12", EN5, b=b"garbage"), "corrupt_image", "drop"),
    (_mk("t13", EN5, b=None), "corrupt_image", "drop"),
    (_mk("t14", EN5 + " mail bob@x.com ok"), "scrub", "scrub"),
    (_mk("t15", "alice@example.com bob@example.org carol@example.net dave@example.com erin@example.ch"), "pii_only_after_scrub", "drop"),
    # multi-rule collision: corrupt beats scrub beats nothing
    (_mk("t16", EN5 + " mail bob@x.com ok", fmt="bmp"), "corrupt_image", "drop"),
    # boundary: exactly 256 words is NOT long (needs > 256), density kept
    # above 0.05 (20/256) and repetition low (241 distinct / 256)
    (_mk("t17", " ".join((["the", "a", "and", "of", "in"] * 4) + [f"w{i}" for i in range(236)])), "keep", "keep"),
    # repetition exactly at 0.5 -> hit (>= threshold)
    (_mk("t18", "x x x x the and"), "repetition", "drop"),
]


@pytest.fixture(scope="module")
def decided(spark):
    pdf = pd.DataFrame([r for r, _, _ in CASES])
    df = spark.createDataFrame(pdf, PAIRS_SCHEMA)
    out = run_cascade(df).toPandas().set_index("image_id")
    return out


@pytest.mark.parametrize("row,rule,decision", CASES, ids=[r["image_id"] for r, _, _ in CASES])
def test_case(decided, row, rule, decision):
    got = decided.loc[row["image_id"]]
    assert got["rule"] == rule, (row["image_id"], got["rule"], rule, got["reasons"])
    assert got["decision"] == decision


def test_near_dup_boundary_pair(spark):
    """Hamming exactly at radius clusters; radius+1 does not."""
    base = 0x5555
    rows = [
        _mk("n1", EN5, phash=base),
        _mk("n2", EN5, phash=base ^ (0b111 << 30)),   # d=3 -> dup
        _mk("n3", EN5, phash=base ^ (0b1111 << 40)),  # d>=4 from both -> distinct
    ]
    out = run_cascade(
        spark.createDataFrame(pd.DataFrame(rows), PAIRS_SCHEMA)
    ).toPandas().set_index("image_id")
    assert out.loc["n1", "rule"] == "keep"
    assert out.loc["n2", "rule"] == "near_duplicate"
    assert out.loc["n3", "rule"] == "keep"


def test_override_conflicts_every_outcome(spark):
    rows = [
        _mk("o1", EN5),                               # keep -> forced drop
        _mk("o2", "zxq vqk pzw jkl mno pqr"),        # drop -> forced keep
        _mk("o3", EN5 + " mail bob@x.com ok"),        # scrub -> forced drop
    ]
    ov = pd.DataFrame(
        [
            {"image_id": "o1", "forced_decision": "drop"},
            {"image_id": "o2", "forced_decision": "keep"},
            {"image_id": "o3", "forced_decision": "drop"},
        ]
    )
    out = run_cascade(
        spark.createDataFrame(pd.DataFrame(rows), PAIRS_SCHEMA),
        overrides=spark.createDataFrame(ov),
    ).toPandas().set_index("image_id")
    assert (out["rule"] == "override").all()
    assert out.loc["o1", "decision"] == "drop"
    assert out.loc["o2", "decision"] == "keep"
    assert out.loc["o3", "decision"] == "drop"
    # scrub text survives the override flip (was computed pre-override)
    assert "<EMAIL>" in out.loc["o3", "caption_scrubbed"]
