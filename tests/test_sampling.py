"""Deterministic sampling operators (O5 + mixture sampling w/ epochs)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from stop_sync_osm_atlas_spark.operators.sampling import (
    hash_sample,
    mixture_rates,
    mixture_sample,
)


def _corpus(spark, n=3000, seed=3):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "lang": rng.choice(["en", "de", "fr", "es"], size=n, p=[0.5, 0.2, 0.2, 0.1]),
            "n_tok": rng.integers(10, 200, size=n),
        }
    )
    return spark.createDataFrame(pdf).repartition(7), pdf


def test_mixture_rates_math_and_unlisted_domains(spark):
    sdf, pdf = _corpus(spark)
    weights = {"en": 0.5, "de": 0.3, "fr": 0.2}
    budget = 40_000.0
    rates = {
        r["lang"]: (r["_tokens"], r["_n_full"], r["_thr"])
        for r in mixture_rates(sdf, weights, budget, F.col("n_tok")).collect()
    }
    # unlisted domain ('es') must get NO row — never the cap rate (the
    # Spark least()-ignores-nulls trap)
    assert "es" not in rates
    for lang, w in weights.items():
        tokens = int(pdf[pdf.lang == lang].n_tok.sum())
        rate = min(1.0, budget * w / tokens)
        n_full = int(np.floor(rate))
        thr = int(np.floor((rate - np.floor(rate)) * 1_000_000))
        assert rates[lang] == (tokens, n_full, thr), lang


def test_mixture_sample_hits_target_token_mass(spark):
    sdf, pdf = _corpus(spark)
    weights = {"en": 0.5, "de": 0.3, "fr": 0.2}
    budget = 40_000.0
    out = mixture_sample(sdf, weights, budget, F.col("n_tok")).toPandas()
    assert set(out.lang) <= set(weights)
    assert (out.epoch == 0).all()  # max_epochs=1 -> single copies only
    # sampled token mass per domain ~ budget * w (hash sampling is
    # uniform over ids; 20% tolerance at these counts)
    for lang, w in weights.items():
        got = out[out.lang == lang].n_tok.sum()
        assert abs(got - budget * w) / (budget * w) < 0.2, (lang, got)
    # determinism: identical sample on re-run
    out2 = mixture_sample(sdf, weights, budget, F.col("n_tok")).toPandas()
    assert sorted(out.doc_id) == sorted(out2.doc_id)


def test_mixture_sample_clamps_small_domains(spark):
    sdf, pdf = _corpus(spark)
    # huge budget at max_epochs=1 -> every rate clamps to 1.0 -> all
    # listed docs kept exactly once (no replication without opt-in)
    out = mixture_sample(
        sdf, {"en": 0.9, "de": 0.1}, 10_000_000.0, F.col("n_tok")
    ).toPandas()
    expect = pdf[pdf.lang.isin(["en", "de"])]
    assert sorted(out.doc_id) == sorted(expect.doc_id)
    assert (out.epoch == 0).all()


def test_mixture_sample_epochs_upweight(spark):
    """rate > 1 with max_epochs: every doc of an under-budget domain
    replicates floor(rate) times, the md5-bucket fraction grants copy
    floor(rate)+1, the cap binds, and token mass tracks budget * w."""
    sdf, pdf = _corpus(spark)
    weights = {"en": 0.2, "de": 0.5, "fr": 0.3}
    # de tokens ~= 62k -> rate 400k*0.5/62k ~= 3.2 -> caps at 3;
    # fr ~= 63k -> rate ~1.9 (1 full + fraction); en ~312k -> rate ~0.26
    budget = 400_000.0
    out = mixture_sample(
        sdf, weights, budget, F.col("n_tok"), max_epochs=3
    ).toPandas()

    per_doc = out.groupby(["lang", "doc_id"]).agg(
        n=("epoch", "size"), mx=("epoch", "max")
    )
    # epochs are dense 0..n-1 per doc
    assert (per_doc["mx"] == per_doc["n"] - 1).all()

    for lang, w in weights.items():
        tokens = int(pdf[pdf.lang == lang].n_tok.sum())
        rate = min(3.0, budget * w / tokens)
        n_full = int(np.floor(rate))
        sub = per_doc.loc[lang]
        n_docs = int((pdf.lang == lang).sum())
        if n_full >= 1:
            # every domain doc present with n_full or n_full+1 copies
            assert len(sub) == n_docs
            assert set(sub["n"]) <= {n_full, n_full + 1}
        else:
            assert (sub["n"] == 1).all()
        # replicated token mass ~ budget * w (exact when the cap binds)
        got = (out[out.lang == lang].n_tok).sum()
        if rate == 3.0:
            assert got == 3 * tokens
        else:
            assert abs(got - budget * w) / (budget * w) < 0.2, (lang, got)

    # determinism incl. copy counts
    out2 = mixture_sample(
        sdf, weights, budget, F.col("n_tok"), max_epochs=3
    ).toPandas()
    key = ["doc_id", "epoch"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True)[["doc_id", "lang", "epoch"]],
        out2.sort_values(key).reset_index(drop=True)[["doc_id", "lang", "epoch"]],
    )


def test_hash_sample_consistent_across_tables(spark):
    sdf, pdf = _corpus(spark)
    a = set(r["doc_id"] for r in hash_sample(sdf, 150).select("doc_id").collect())
    sidecar = sdf.select("doc_id", F.lit(1).alias("x"))
    b = set(r["doc_id"] for r in hash_sample(sidecar, 150).select("doc_id").collect())
    assert a == b and a


def test_mixture_zero_token_domain_is_dropped_not_div0(spark):
    """A listed domain whose docs sum to 0 tokens must emit nothing —
    not raise DIVIDE_BY_ZERO under ANSI mode (the Spark 4 default) from
    budget * w / 0 in the rate expression."""
    sdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "lang": ["en", "en", "zz", "zz"],
                "n_tok": [50, 70, 0, 0],
            }
        )
    )
    weights = {"en": 0.5, "zz": 0.5}
    rates = mixture_rates(sdf, weights, 100.0, F.col("n_tok")).collect()
    assert {r["lang"] for r in rates} == {"en"}
    out = mixture_sample(sdf, weights, 100.0, F.col("n_tok")).collect()
    assert all(r["lang"] == "en" for r in out)
