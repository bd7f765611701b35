"""T1 unit tests: each rule/operator on hand-built micro-frames
(SURVEY.md §5; threshold semantics shaped after the reference's
problem_detection.py:36-64 ladder)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from stop_sync_osm_atlas_spark.functions import text as TX
from stop_sync_osm_atlas_spark.functions.langid import langid_marker_cols
from stop_sync_osm_atlas_spark.operators import scrub as SC
from stop_sync_osm_atlas_spark.operators.rules import RULE_PRIORITY, RULE_TABLE


def _one(spark, caption, col):
    df = spark.createDataFrame(pd.DataFrame({"caption": [caption]}))
    return df.select(col.alias("v")).collect()[0]["v"]


def test_n_words(spark):
    assert _one(spark, "a b  c", TX.n_words(F.col("caption"))) == 3
    assert _one(spark, "   ", TX.n_words(F.col("caption"))) == 0
    assert _one(spark, None, TX.n_words(F.col("caption"))) == 0


def test_repetition_ratio(spark):
    assert _one(spark, "x x x y", TX.repetition_ratio(F.col("caption"))) == 0.5
    assert _one(spark, "a b c d", TX.repetition_ratio(F.col("caption"))) == 0.0
    assert _one(spark, None, TX.repetition_ratio(F.col("caption"))) == 0.0


def test_symbol_ratio(spark):
    # "ab!!" -> 2 symbols of 4 non-space chars
    assert _one(spark, "ab!!", TX.symbol_ratio(F.col("caption"))) == 0.5
    assert _one(spark, "abcd", TX.symbol_ratio(F.col("caption"))) == 0.0
    assert _one(spark, "", TX.symbol_ratio(F.col("caption"))) == 0.0


def test_stopword_density(spark):
    v = _one(spark, "the mountain of dreams", TX.stopword_density(F.col("caption"), ["the", "of"]))
    assert v == 0.5


def test_token_count(spark):
    # "ab12-cd" -> ab | 12 | - | cd = 4
    assert _one(spark, "ab12-cd", TX.token_count_bpe_ish(F.col("caption"))) == 4


def test_langid_markers(spark):
    lang, conf = langid_marker_cols(F.col("caption"))
    assert _one(spark, "the train and the station", lang) == "en"
    assert _one(spark, "der zug und die station", lang) == "de"
    assert _one(spark, "zxq vqk pzw", lang) == "und"
    assert _one(spark, None, lang) == "und"


def test_scrub_patterns(spark):
    cases = {
        "mail me at bob@x.com now": "mail me at <EMAIL> now",
        "go to https://a.b/c?d=1 ok": "go to <URL> ok",
        "id 1234567890123456 here": "id <ID> here",
        "call +41 79 123 45 67 now": "call <PHONE> now",
        "that badword1 thing": "that <TOX> thing",
        "clean caption": "clean caption",
    }
    for src, expect in cases.items():
        got = _one(spark, src, SC.scrubbed_caption(F.col("caption")))
        assert got == expect, (src, got, expect)
        assert SC.scrub_python(src) == expect


def test_pii_only(spark):
    assert _one(spark, "alice@ex.com bob@ex.org carol@ex.net dave@ex.com erin@ex.ch", SC.pii_only_hit(F.col("caption")))
    assert not _one(spark, "words around a@b.com here", SC.pii_only_hit(F.col("caption")))


def test_rule_priorities_strictly_ordered():
    prios = [p for _, p, _, _ in RULE_TABLE]
    assert prios == sorted(prios) and len(set(prios)) == len(prios)
    assert RULE_PRIORITY["override"] < RULE_PRIORITY["corrupt_image"]
    assert RULE_PRIORITY["scrub"] > RULE_PRIORITY["near_duplicate"]


def test_token_set_hits_adjacency(spark):
    """Adjacent stopwords must all count (lookahead, no consumption)."""
    from stop_sync_osm_atlas_spark.functions.text import token_set_hits

    cases = {
        "the and the": 3,
        "the theo and": 2,   # 'theo' is not a token match
        "THE  And\tthe": 3,  # case/whitespace normalization
        "": 0,
        None: 0,
    }
    for src, expect in cases.items():
        got = _one(spark, src, token_set_hits(F.col("caption"), ["the", "and"]))
        assert got == expect, (src, got, expect)


def test_disabled_rules_match_oracle(spark, fixture_1k, fixture_paths, nd_kwargs):
    """Per-rule enable switches (reference problem_detection.py:20-23
    ENABLE_* analog): with symbol_ratio and near_duplicate off, the
    engine and the pandas oracle agree row-for-row, no row resolves to
    the disabled rules, and previously-hit rows re-resolve."""
    from stop_sync_osm_atlas_spark.operators.cascade import run_cascade
    from stop_sync_osm_atlas_spark.operators.rules import RuleConfig
    from stop_sync_osm_atlas_spark.oracle.oracle import run_oracle
    from stop_sync_osm_atlas_spark.schemas import PAIRS_SCHEMA

    cfg = RuleConfig(disabled_rules=("symbol_ratio", "near_duplicate"))
    pairs_sdf = spark.read.schema(PAIRS_SCHEMA).parquet(fixture_paths["pairs"])
    eng = (
        run_cascade(pairs_sdf, cfg=cfg, neardup_kwargs=nd_kwargs)
        .toPandas()
        .set_index("image_id")
        .sort_index()
    )
    orc = (
        run_oracle(fixture_1k.pairs, cfg=cfg, neardup_kwargs=nd_kwargs)
        .set_index("image_id")
        .sort_index()
    )
    assert not (eng["rule"] == "symbol_ratio").any()
    assert not (eng["rule"] == "near_duplicate").any()
    # planted symbol_ratio violations must now resolve downstream
    lbl = fixture_1k.labels.set_index("image_id")
    sym_rows = lbl[lbl["true_rule"] == "symbol_ratio"].index
    assert len(sym_rows) > 0
    for col in ["decision", "rule", "severity"]:
        assert (eng.loc[sym_rows, col] == orc.loc[sym_rows, col]).all(), col
    assert (eng["rule"] == orc["rule"]).all()
    assert (eng["decision"] == orc["decision"]).all()


def test_whitespace_semantics_aligned_across_mirrors(spark):
    """The four mirrors of the text-signal stack — Catalyst
    (functions/text), the fused Arrow pass (functions/image
    _text_signals), and the pandas oracle (oracle/oracle._words) — must
    agree on exotic-whitespace captions: tab/CRLF padding (phantom ''
    tokens under the old space-only trim), NBSP (unicode-\\s in Python
    but never in Java/RE2), and whitespace-only strings. DuckDB is
    covered by the driver gate via _sql_words/_WS."""
    from stop_sync_osm_atlas_spark.functions import text as TX
    from stop_sync_osm_atlas_spark.functions.image import _text_signals
    from stop_sync_osm_atlas_spark.oracle.oracle import _words
    from stop_sync_osm_atlas_spark.operators.scrub import pii_only_hit

    cases = [
        None,
        "",
        " ",
        "\t",
        "\r\n",
        "\thello world\t",
        " hello  world ",
        "a b ",
        "\r\nthe cat\r\nsat down\r\n",
        "caf\xa0au lait",   # NBSP: one token boundary in NO mirror
        "\xa0",              # NBSP-only: NOT blank in any mirror
        "the the the",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["cap"])
    got = df.select(
        "cap",
        TX.words(F.col("cap")).alias("w"),
        TX.n_words(F.col("cap")).alias("nw"),
        TX.is_blank(F.col("cap")).alias("blank"),
        pii_only_hit(F.col("cap")).alias("pii_only"),
    ).collect()
    by_cap = {r.cap: r for r in got}
    for cap in cases:
        r = by_cap[cap]
        exp_words = _words(cap)
        assert r.w == exp_words, (cap, r.w, exp_words)
        assert r.nw == len(exp_words), (cap, r.nw)
        fused = _text_signals(cap)
        assert fused[0] == len(exp_words), (cap, "fused n_words", fused[0])
        # blank <=> zero words, and never any phantom '' token
        assert r.blank == (len(exp_words) == 0), (cap, r.blank)
        assert "" not in exp_words and "" not in (r.w or [])
        assert not r.pii_only  # none of these are placeholder-only
