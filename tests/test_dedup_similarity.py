"""Dedup pack + similarity search quality tests (training-data ops)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stop_sync_osm_atlas_spark.operators import dedup as DD
from stop_sync_osm_atlas_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat today"),  # near dup of 1
        (4, "completely different text about spark query engines"),
        (5, "another unrelated document mentioning database joins"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_exact_dedup(docs):
    out = DD.exact_dedup(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "dup_count"] == 2 and out.loc[2, "dup_count"] == 2
    assert out.loc[1, "is_canonical"] and not out.loc[2, "is_canonical"]
    assert out.loc[3, "dup_count"] == 1


def test_ngram_jaccard(docs):
    out = DD.ngram_jaccard_pairs(docs, threshold=0.3).toPandas()
    pairs = {(r.a_id, r.b_id): r.jaccard for r in out.itertuples()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.3 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs and (4, 5) not in pairs


def test_minhash_estimates_jaccard(spark):
    # 60 docs in 20 near-dup triplets; est jaccard within 0.3 abs of true
    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(200)]
    rows = []
    for g in range(20):
        base = list(rng.choice(vocab, 30, replace=False))
        for v in range(3):
            words = base.copy()
            for _ in range(v * 3):
                words[int(rng.integers(len(words)))] = str(rng.choice(vocab))
            rows.append((g * 3 + v, " ".join(words)))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    est = DD.minhash_lsh_pairs(docs, threshold=0.2).toPandas()
    true = DD.ngram_jaccard_pairs(docs, threshold=0.0).toPandas()
    m = est.merge(true, on=["a_id", "b_id"])
    assert len(m) > 10
    assert (m["est_jaccard"] - m["jaccard"]).abs().mean() < 0.25


def test_simhash_neardups_close(docs):
    out = docs.select("doc_id", DD.simhash64(F.col("text")).alias("sh")).toPandas()
    sh = dict(zip(out["doc_id"], out["simhash" if "simhash" in out else "sh"]))
    def ham(a, b):
        return bin((a ^ b) & ((1 << 60) - 1)).count("1")
    assert ham(sh[1], sh[2]) == 0                # identical text
    assert ham(sh[1], sh[3]) < ham(sh[1], sh[4])  # near dup closer than unrelated


def test_lsh_ann_recall(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 10)
    exact = SIM.cosine_topk(emb, queries, k=5).toPandas()
    approx = SIM.lsh_cosine_topk(emb, queries, k=5, dim=64).toPandas()
    e = set(zip(exact["q_id"], exact["c_id"]))
    a = set(zip(approx["q_id"], approx["c_id"]))
    recall = len(e & a) / len(e)
    assert recall >= 0.3, recall  # banded 16-bit sketch on random vectors
