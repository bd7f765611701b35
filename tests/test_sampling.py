"""Deterministic sampling operators (O5 + the r4 mixture sampler)."""

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
        r["lang"]: (r["_tokens"], r["_thr"])
        for r in mixture_rates(sdf, weights, budget, F.col("n_tok")).collect()
    }
    # unlisted domain ('es') must get NO row — never rate 1 (the Spark
    # least()-ignores-nulls trap)
    assert "es" not in rates
    for lang, w in weights.items():
        tokens = int(pdf[pdf.lang == lang].n_tok.sum())
        expect = int(np.floor(min(1.0, budget * w / tokens) * 1_000_000))
        assert rates[lang] == (tokens, expect), lang


def test_mixture_sample_hits_target_token_mass(spark):
    sdf, pdf = _corpus(spark)
    weights = {"en": 0.5, "de": 0.3, "fr": 0.2}
    budget = 40_000.0
    out = mixture_sample(sdf, weights, budget, F.col("n_tok")).toPandas()
    assert set(out.lang) <= set(weights)
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
    # huge budget -> every rate clamps to 1.0 -> all listed docs kept
    out = mixture_sample(
        sdf, {"en": 0.9, "de": 0.1}, 10_000_000.0, F.col("n_tok")
    ).toPandas()
    expect = pdf[pdf.lang.isin(["en", "de"])]
    assert sorted(out.doc_id) == sorted(expect.doc_id)


def test_hash_sample_consistent_across_tables(spark):
    sdf, pdf = _corpus(spark)
    a = set(r["doc_id"] for r in hash_sample(sdf, 150).select("doc_id").collect())
    sidecar = sdf.select("doc_id", F.lit(1).alias("x"))
    b = set(r["doc_id"] for r in hash_sample(sidecar, 150).select("doc_id").collect())
    assert a == b and a
