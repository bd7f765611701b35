"""Integration test for plans/corpus.prepare_corpus — the composed
LLM-training-data pipeline (clean -> exact dedup -> LSH near-dedup ->
model quality ladder -> pack). Conservation invariants across stages."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus_df(spark):
    from stop_sync_osm_atlas_spark.fixtures.generator import _CONTENT, _caption

    rng = np.random.default_rng(42)
    rows = []
    langs = sorted(_CONTENT)
    boiler = "Cookie notice: accept all"
    for i in range(300):
        lang = langs[int(rng.integers(0, len(langs)))]
        body = _caption(rng, lang, int(rng.integers(3, 25)))
        text = f"{boiler}\n{body}\n{body}"  # boilerplate + within-doc dup
        rows.append((f"d{i:04d}", text, lang))
    # planted exact dups (same text after cleaning)
    for j in range(10):
        rows.append((f"x{j:02d}", rows[j][1], rows[j][2]))
    # degenerate docs
    rows += [("e00", "", "de"), ("e01", "   \n  ", "fr"), ("e02", "one two", "it")]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    ).repartition(8)


def test_prepare_corpus_conservation(spark, corpus_df):
    from stop_sync_osm_atlas_spark.plans.corpus import prepare_corpus

    # the fixture's body\nbody docs carry dup_line_frac 1/3 by design
    # (they exercise within-doc line cleaning); raise the repetition
    # thresholds above that so this test keeps grading the model ladder —
    # the rule itself is graded by test_high_line_repetition_rule
    decisions, bins = prepare_corpus(
        corpus_df, max_line_df=2,
        max_dup_line_frac=0.5, max_dup_line_char_frac=0.75,
    )
    dec = decisions.toPandas()
    n_in = corpus_df.count()

    # one decision per input doc, no dups, decision/reason consistent
    assert len(dec) == n_in
    assert dec["doc_id"].is_unique
    assert set(dec["decision"]) <= {"keep", "drop"}
    assert ((dec["reason"] == "keep") == (dec["decision"] == "keep")).all()

    # planted exact dups: exactly one of each pair survives exact-dedup
    for j in range(10):
        pair = dec[dec["doc_id"].isin([f"d{j:04d}", f"x{j:02d}"])]
        assert (pair["reason"] == "exact_dup").sum() == 1, pair

    # degenerate docs never keep
    deg = dec[dec["doc_id"].isin(["e00", "e01", "e02"])]
    assert (deg["decision"] == "drop").all()
    assert set(deg["reason"]) <= {"empty", "too_short", "exact_dup", "near_dup"}

    # packing conserves kept docs and tokens exactly
    kept = dec[dec["decision"] == "keep"]
    b = bins.toPandas()
    assert b["n_docs"].sum() == len(kept)
    assert b["total_tokens"].sum() == kept["n_tok"].sum()

    # determinism: a second invocation yields identical decisions
    dec2 = prepare_corpus(
        corpus_df, max_line_df=2,
        max_dup_line_frac=0.5, max_dup_line_char_frac=0.75,
    )[0].toPandas()
    a = dec.sort_values("doc_id").reset_index(drop=True)
    c = dec2.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, c)


def test_exact_fp_prefix_trade(spark):
    """The unified prefix knob at the prepare_corpus entry point: two
    docs sharing their first 64 cleaned chars but diverging later are
    DISTINCT under the default exact fingerprint and collapse as
    exact_dup when exact_fp_prefix binds — the same documented trade as
    operators.dedup.exact_dedup(prefix_len=...)."""
    from stop_sync_osm_atlas_spark.plans.corpus import prepare_corpus

    shared = "the quick brown fox jumps over the lazy dog near the river"
    rows = [
        ("p0", f"{shared} and then it rested for a while", "en"),
        ("p1", f"{shared} but later it ran far away instead", "en"),
    ]
    # filler so models/LSH have a corpus to work with
    for i in range(12):
        rows.append((f"f{i:02d}", f"completely unrelated text number {i} here", "en"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))

    exact, _ = prepare_corpus(df)
    de = exact.toPandas().set_index("doc_id")
    exact.unpersist()
    assert de.loc["p0", "reason"] != "exact_dup"
    assert de.loc["p1", "reason"] != "exact_dup"

    bounded, _ = prepare_corpus(df, exact_fp_prefix=len(shared))
    db = bounded.toPandas().set_index("doc_id")
    bounded.unpersist()
    # min doc_id survives; the later-diverging twin collides away
    assert db.loc["p1", "reason"] == "exact_dup"
    assert db.loc["p0", "reason"] != "exact_dup"


def test_exact_dedup_full_text_mode(spark):
    """prefix_len=None hashes the FULL normalized text: prefix-sharing
    docs that collide at prefix_len=48 stay distinct."""
    from stop_sync_osm_atlas_spark.operators.dedup import exact_dedup

    shared = "a" * 60
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [shared + " tail one", shared + " tail two"],
            }
        )
    )
    full = exact_dedup(df, prefix_len=None).toPandas()
    assert (full["dup_count"] == 1).all()
    short = exact_dedup(df, prefix_len=48).toPandas()
    assert (short["dup_count"] == 2).all()


def test_high_line_repetition_rule(spark):
    """The Gopher/MassiveText repetition gate at DEFAULT thresholds
    (0.30 dup lines / 0.20 dup chars, over the RAW pre-cleaning text):
    planted repetitive docs drop with reason high_line_repetition —
    ahead of the cleaned-text rules, since cleaning collapses the
    repeats and would otherwise misreport them as too_short — while
    docs below both thresholds never carry the reason."""
    from stop_sync_osm_atlas_spark.plans.corpus import prepare_corpus

    body = "the quick brown fox jumps over the lazy dog again today"
    rows = []
    # repetitive: one line x 10 (frac 0.9) — cleaning collapses it to a
    # single line, so without the gate this doc would read as a normal
    # short doc
    rows.append(("rep0", "\n".join(["spam offer click here now"] * 10), "en"))
    # repetitive by CHAR fraction only: one long dup line among many
    # short distinct ones (line frac 1/8 < 0.30, char frac > 0.20)
    longline = " ".join(["repeated boilerplate sentence"] * 4)
    rows.append(
        ("rep1", "\n".join([longline, longline] + [f"s{i}" for i in range(6)]), "en")
    )
    # clean controls: distinct lines, below both thresholds
    for i in range(20):
        rows.append((f"c{i:02d}", f"{body} {i}\nsecond line {i} differs", "en"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))

    decisions, _ = prepare_corpus(df)
    dec = decisions.toPandas().set_index("doc_id")
    decisions.unpersist()
    assert dec.loc["rep0", "reason"] == "high_line_repetition"
    assert dec.loc["rep1", "reason"] == "high_line_repetition"
    assert dec.loc["rep0", "decision"] == "drop"
    ctrl = dec[dec.index.str.startswith("c")]
    assert (ctrl["reason"] != "high_line_repetition").all()


def test_high_ngram_repetition_rule(spark):
    """The word-level Gopher gate at DEFAULT thresholds (top-2-gram
    > 0.20 / dup-5-gram > 0.15, over the CLEANED text): a phrase
    looping WITHIN one line — invisible to line dedup — drops with
    reason high_ngram_repetition; the gate sits AFTER the length
    gates (a 4-token doc reports too_short, never ngram, because
    top-gram fractions are trivially large on tiny docs); passing
    empty dials disables the stage entirely."""
    from stop_sync_osm_atlas_spark.plans.corpus import prepare_corpus

    body = "the quick brown fox jumps over the lazy dog again today"
    rows = []
    # SEO-spam shape: one line, phrase x6 — line cleaning keeps it
    # verbatim (no repeated lines), only the n-gram gate can see it
    rows.append(
        ("spam", "visit shop " + " ".join(["buy now"] * 6) + " deal7", "en")
    )
    # ordering contract: repetitive but BELOW min_words -> too_short
    rows.append(("tiny", "buy now buy now", "en"))
    # clean controls: all bigrams unique, well under both dials
    for i in range(20):
        rows.append((f"c{i:02d}", f"{body} {i}\nsecond line {i} differs", "en"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))

    decisions, _ = prepare_corpus(df)
    dec = decisions.toPandas().set_index("doc_id")
    decisions.unpersist()
    assert dec.loc["spam", "reason"] == "high_ngram_repetition"
    assert dec.loc["spam", "decision"] == "drop"
    assert dec.loc["tiny", "reason"] == "too_short"
    ctrl = dec[dec.index.str.startswith("c")]
    assert (ctrl["reason"] != "high_ngram_repetition").all()

    # dials {} = stage off: the spam doc must fall through to a
    # DIFFERENT rule (or keep) and the plan must not pay the gate
    decisions2, _ = prepare_corpus(
        df, max_top_ngram_char_frac={}, max_dup_ngram_char_frac={}
    )
    dec2 = decisions2.toPandas().set_index("doc_id")
    decisions2.unpersist()
    assert dec2.loc["spam", "reason"] != "high_ngram_repetition"
    assert (dec2["reason"] != "high_ngram_repetition").all()


def test_remove_dup_spans_stage(spark):
    """Optional ExactSubstr stage (remove_dup_spans_k): a 13-token
    license block embedded INLINE in six docs' otherwise-unique single
    line — invisible to line cleaning (no repeated or cross-doc line)
    and to doc-level dedup (docs differ) — is stripped from ALL of
    them before fingerprinting/scoring/packing, so n_tok reflects the
    trainer-visible text; off by default the same docs keep their full
    token count; a control doc is untouched in both modes."""
    from stop_sync_osm_atlas_spark.plans.corpus import prepare_corpus

    block = (
        "licensed under the creative commons attribution share alike"
        " license version four point zero"
    )  # 13 tokens
    rows = []
    for i in range(6):
        pre = f"intro{i} one{i} two{i} three{i} four{i} five{i}"
        suf = f"tail{i} six{i} seven{i} eight{i} nine{i} end{i}"
        rows.append((f"b{i}", f"{pre} {block} {suf}", "en"))
    rows.append(
        ("ctrl", "only unique words here nothing shared at all today friend buddy", "en")
    )
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )

    on, _ = prepare_corpus(df, remove_dup_spans_k=8)
    dec_on = on.toPandas().set_index("doc_id")
    on.unpersist()
    off, _ = prepare_corpus(df)
    dec_off = off.toPandas().set_index("doc_id")
    off.unpersist()

    assert len(dec_on) == len(rows) and len(dec_off) == len(rows)
    for i in range(6):
        assert dec_off.loc[f"b{i}", "n_tok"] == 25
        assert dec_on.loc[f"b{i}", "n_tok"] == 12  # 13-token block gone
    assert dec_on.loc["ctrl", "n_tok"] == 11
    assert dec_off.loc["ctrl", "n_tok"] == 11


def test_gopher_format_and_word_rules(spark):
    """The round-5 Gopher completion, one planted doc per new gate at
    DEFAULT dials: >90% bullet-start lines -> high_bullet_lines; >30%
    ellipsis-end lines -> high_ellipsis_lines (both on RAW lines,
    after the repetition gate); mean word length > 10 ->
    word_length_outlier; < 80% alpha-bearing tokens -> low_alpha_ratio;
    < 2 pooled-stopword hits -> low_stopword_count (all on CLEANED
    tokens, after the length/ngram gates and in that order — the
    long-words doc has zero stopwords but reports the earlier reason).
    Controls with body text keep passing every gate; passing None
    disables a dial."""
    from stop_sync_osm_atlas_spark.plans.corpus import prepare_corpus

    body = "the quick brown fox jumps with the lazy dog again today"
    rows = [
        # 10 non-empty lines, all bullets, all distinct (no line dup)
        ("bul", "\n".join(f"- item number {i} here" for i in range(10)), "en"),
        # 2 of 4 lines end with ellipses (one '...', one '…')
        ("ell", "teaser one...\nplain line here\nteaser two…\n"
                "the festival opens with music and lights tonight", "en"),
        # 12 distinct 21-char tokens: mean word length >> 10, but long
        # enough that the (unique) top bigram stays under the 0.20
        # n-gram dial; zero stopwords too, so this also pins the gate
        # ORDER (word_length_outlier beats low_stopword_count)
        ("wlen", " ".join(f"hypervirtualization{i:02d}" for i in range(12)),
         "en"),
        # 12 tokens of which only 2 contain a letter (2/12 < 0.80)
        ("alpha", "the 123 456 789 012 345 678 901 234 567 890 and1", "en"),
        # enough normal-length distinct alpha words, but zero pooled
        # stopword hits
        ("stop", "quick brown foxes jump over lazy dogs every single "
                 "morning without rest near rivers under bridges beyond "
                 "quiet hills", "en"),
    ]
    for i in range(4):
        rows.append((f"c{i}", f"{body} {i}\nsecond line {i} differs", "en"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    decisions, _ = prepare_corpus(df)
    dec = decisions.toPandas().set_index("doc_id")
    decisions.unpersist()
    assert dec.loc["bul", "reason"] == "high_bullet_lines"
    assert dec.loc["ell", "reason"] == "high_ellipsis_lines"
    assert dec.loc["wlen", "reason"] == "word_length_outlier"
    assert dec.loc["alpha", "reason"] == "low_alpha_ratio"
    assert dec.loc["stop", "reason"] == "low_stopword_count"
    ctrl = dec[dec.index.str.startswith("c")]
    new = {"high_bullet_lines", "high_ellipsis_lines", "word_length_outlier",
           "low_alpha_ratio", "low_stopword_count"}
    assert not set(ctrl["reason"]) & new

    # disabling the dials lets each planted doc fall through to a
    # DIFFERENT rule (or keep)
    decisions2, _ = prepare_corpus(
        df,
        max_bullet_line_frac=None,
        max_ellipsis_line_frac=None,
        word_len_range=None,
        min_alpha_word_frac=None,
        min_stopword_hits=None,
    )
    dec2 = decisions2.toPandas().set_index("doc_id")
    decisions2.unpersist()
    assert not set(dec2["reason"]) & new


@pytest.mark.parametrize("seed", [31, 32])
def test_prepare_corpus_invariants_randomized(spark, seed):
    """Ladder-wide invariants on random corpora (mixed languages,
    bullets, ellipses, repetition, numerics, blanks, tab padding):
    every input doc gets EXACTLY one decision; the reason set is
    closed over the documented thirteen; keep <=> reason 'keep'; every
    kept doc meets the min_words floor; bins conserve kept n_tok."""
    from stop_sync_osm_atlas_spark.plans.corpus import prepare_corpus

    rng = np.random.default_rng(seed)
    frag = [
        "the quick brown fox", "- bullet item", "read more...",
        "und der die das", "buy now buy now", "1234 5678",
        "plain body text with words", "", " \t ",
        "x" * 30, "et la le les dans",
    ]
    rows = []
    for i in range(150):
        n = int(rng.integers(0, 8))
        text = "\n".join(
            frag[int(rng.integers(0, len(frag)))] for _ in range(n)
        )
        lang = ["en", "de", "fr", "it"][int(rng.integers(0, 4))]
        rows.append((f"d{i:03d}", text, lang))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )
    decisions, bins = prepare_corpus(df)
    dec = decisions.toPandas()
    nb = bins.toPandas()
    decisions.unpersist()

    assert len(dec) == len(rows)
    assert dec["doc_id"].is_unique
    allowed = {
        "keep", "exact_dup", "near_dup", "high_line_repetition",
        "high_bullet_lines", "high_ellipsis_lines", "empty", "too_short",
        "high_ngram_repetition", "word_length_outlier", "low_alpha_ratio",
        "low_stopword_count", "high_perplexity", "langid_mismatch",
    }
    assert set(dec["reason"]) <= allowed
    assert ((dec["decision"] == "keep") == (dec["reason"] == "keep")).all()
    kept = dec[dec["decision"] == "keep"]
    assert (kept["n_tok"] >= 5).all()
    # packing conserves every kept doc and token exactly once
    assert nb["n_docs"].sum() == len(kept)
    assert nb["total_tokens"].sum() == kept["n_tok"].sum()


def test_corpus_config_api_and_keep_first_stage(spark):
    """CorpusConfig object semantics: an explicit config equals the
    keyword-override shim field-for-field; unknown keywords raise
    eagerly; and remove_dup_spans_keep_first threads the keep-one
    ExactSubstr removal into the pipeline — the canonical doc (min
    doc_id, the block's earliest position holder) keeps its license
    block while every other copy is stripped."""
    from dataclasses import replace

    from stop_sync_osm_atlas_spark.plans.corpus import (
        CorpusConfig,
        prepare_corpus,
    )

    block = (
        "licensed under the creative commons attribution share alike"
        " license version four point zero"
    )  # 13 tokens
    rows = []
    for i in range(3):
        pre = f"intro{i} one{i} two{i} three{i} four{i} five{i}"
        suf = f"tail{i} six{i} seven{i} eight{i} nine{i} end{i}"
        rows.append((f"b{i}", f"{pre} {block} {suf}", "en"))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    )

    cfg = CorpusConfig(remove_dup_spans_k=8, remove_dup_spans_keep_first=True)
    on, _ = prepare_corpus(df, cfg)
    dec = on.toPandas().set_index("doc_id")
    on.unpersist()
    # b0 is the min (doc_id, pos) holder for every block gram: keeps all
    # 25 tokens; b1/b2 lose the 13-token block
    assert dec.loc["b0", "n_tok"] == 25
    assert dec.loc["b1", "n_tok"] == 12
    assert dec.loc["b2", "n_tok"] == 12

    # config-object call == keyword-override shim (dataclasses.replace
    # under the hood), bit-identical decisions
    via_kw, _ = prepare_corpus(
        df, remove_dup_spans_k=8, remove_dup_spans_keep_first=True
    )
    dec_kw = via_kw.toPandas().set_index("doc_id")
    via_kw.unpersist()
    pd.testing.assert_frame_equal(
        dec.sort_index(), dec_kw.sort_index()
    )

    # replace() composes with a base config
    assert replace(cfg, min_words=9).min_words == 9

    with pytest.raises(TypeError, match="unknown CorpusConfig"):
        prepare_corpus(df, not_a_dial=1)
