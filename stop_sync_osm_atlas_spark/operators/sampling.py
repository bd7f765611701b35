"""Deterministic hash sampling (O5).

Analog of the reference's random problem sampling for review queues
(reference backend/services/search.py:192-206 `random.sample` over
matched ids) — recast deterministic so the same rows are sampled on
every run, every engine, and every retry (a replayable review queue,
and an oracle-checkable operator).

Hash choice: md5 rather than xxhash64 — Spark's xxhash64 has no DuckDB
counterpart, while md5 is bit-identical in Spark, DuckDB and Python
(the repo-wide cross-engine determinism contract, operators/dedup.py).
At scale the sample is a pure codegen'd filter: no shuffle, no state,
pushes through column pruning, and composes with any downstream plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_bucket(key: Column, n_buckets: int = 1000) -> Column:
    """Stable bucket in [0, n_buckets): md5-derived 60-bit int mod N.

    DuckDB mirror:
    CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15)) AS BIGINT) % N
    """
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def hash_sample(
    df: DataFrame,
    rate_buckets: int,
    n_buckets: int = 1000,
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep rows whose stable bucket < rate_buckets (rate = k/N).

    Deterministic: membership depends only on the key, so the sample is
    identical across runs, partitionings and engines — and consistent
    across tables sharing the key (sample a fact table and its
    sidecar with the same (k, N) and the keys line up).
    """
    return df.where(sample_bucket(F.col(key_col), n_buckets) < F.lit(rate_buckets))


def mixture_rates(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: float,
    token_col: Column,
    key_col: str = "lang",
    n_buckets: int = 1_000_000,
) -> DataFrame:
    """-> (key_col, _tokens, _thr): per-domain sampling thresholds.

    rate_k = min(1, budget_tokens * w_k / tokens_k), integerized to a
    bucket threshold _thr = floor(rate_k * n_buckets). The arithmetic is
    plain left-associative double ops so a SQL oracle reproduces _thr
    bit-exactly. Keys absent from ``weights`` get no row (rate 0).
    """
    kvs: list[Column] = []
    for k, w in weights.items():
        kvs += [F.lit(k), F.lit(float(w))]
    w_expr = F.element_at(F.create_map(*kvs), F.col(key_col))
    totals = df.groupBy(key_col).agg(F.sum(token_col).alias("_tokens"))
    # drop unlisted keys BEFORE the clamp: Spark's least() IGNORES nulls
    # (least(1.0, null) = 1.0), so a null weight reaching the clamp
    # would silently sample an unlisted domain at rate 1 instead of 0.
    totals = totals.withColumn("_w", w_expr).where(F.col("_w").isNotNull())
    rate = F.least(
        F.lit(1.0), F.lit(float(budget_tokens)) * F.col("_w") / F.col("_tokens")
    )
    return totals.withColumn(
        "_thr", F.floor(rate * F.lit(n_buckets)).cast("long")
    ).select(key_col, "_tokens", "_thr")


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: float,
    token_col: Column,
    key_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 1_000_000,
) -> DataFrame:
    """Domain-mixture sampling (the Pile/Dolma-style mixing step): keep
    each domain's docs at the deterministic rate that hits a target
    token mixture — rate_k = min(1, budget_tokens * w_k / tokens_k) —
    using the same replayable md5-bucket membership as ``hash_sample``.

    Scale shape: ONE aggregate over (key, tokens) — a per-domain frame
    of a handful of rows — broadcast back onto the corpus, then a pure
    codegen'd filter. No shuffle of the data rows, no randomness, and
    membership depends only on (id, key), so re-runs, retries and other
    engines pick the identical sample. Domains not in ``weights`` are
    dropped (their target share is zero).
    """
    rates = mixture_rates(
        df, weights, budget_tokens, token_col, key_col=key_col, n_buckets=n_buckets
    )
    return (
        df.join(F.broadcast(rates), key_col)
        .where(sample_bucket(F.col(id_col), n_buckets) < F.col("_thr"))
        .drop("_tokens", "_thr")
    )
