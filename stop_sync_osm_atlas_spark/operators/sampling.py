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
    max_epochs: float = 1.0,
) -> DataFrame:
    """-> (key_col, _tokens, _n_full, _thr): per-domain sampling rates.

    rate_k = min(max_epochs, budget_tokens * w_k / tokens_k), split into
    ``_n_full`` = floor(rate_k) guaranteed copies per doc and a
    fractional bucket threshold ``_thr`` = floor(frac(rate_k) *
    n_buckets) granting one extra copy to docs whose stable md5 bucket
    falls below it. With the default ``max_epochs=1`` this reduces to
    the classic downsampling clamp (rate <= 1, membership = bucket <
    _thr); ``max_epochs > 1`` lets an under-represented domain
    OVERSAMPLE by deterministic replication (epochs), which is how real
    mixture builders hit a target share a rare domain can't supply —
    capped so no domain's AVERAGE replication exceeds max_epochs. (At a
    fractional cap the guarantee is domain-level, not per-doc: a
    clamped rate of 2.5 gives every doc 2 copies and a deterministic
    half of them a 3rd — individual docs may repeat ceil(max_epochs)
    times while the domain's token mass averages the cap.) The
    arithmetic is plain left-associative double ops so a SQL oracle
    reproduces both integers bit-exactly. Keys absent from ``weights``
    get no row (rate 0).
    """
    kvs: list[Column] = []
    for k, w in weights.items():
        kvs += [F.lit(k), F.lit(float(w))]
    w_expr = F.element_at(F.create_map(*kvs), F.col(key_col))
    totals = df.groupBy(key_col).agg(F.sum(token_col).alias("_tokens"))
    # drop unlisted keys BEFORE the clamp: Spark's least() IGNORES nulls
    # (least(1.0, null) = 1.0), so a null weight reaching the clamp
    # would silently sample an unlisted domain at the cap instead of 0.
    totals = totals.withColumn("_w", w_expr).where(F.col("_w").isNotNull())
    # a listed domain whose docs sum to 0 tokens can't supply anything:
    # emit no rate row (same outcome as rate 0) rather than letting
    # budget * w / 0 raise DIVIDE_BY_ZERO under ANSI mid-job
    totals = totals.where(F.col("_tokens") > 0)
    rate = F.least(
        F.lit(float(max_epochs)),
        F.lit(float(budget_tokens)) * F.col("_w") / F.col("_tokens"),
    )
    return (
        totals.withColumn("_n_full", F.floor(rate).cast("long"))
        .withColumn(
            "_thr",
            F.floor((rate - F.floor(rate)) * F.lit(n_buckets)).cast("long"),
        )
        .select(key_col, "_tokens", "_n_full", "_thr")
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: float,
    token_col: Column,
    key_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = 1_000_000,
    max_epochs: float = 1.0,
) -> DataFrame:
    """Domain-mixture sampling (the Pile/Dolma-style mixing step): emit
    each domain's docs at the deterministic rate that hits a target
    token mixture — rate_k = min(max_epochs, budget_tokens * w_k /
    tokens_k) — using the same replayable md5-bucket membership as
    ``hash_sample``. Output rows carry an ``epoch`` column (0-based
    copy index): rate <= 1 keeps/drops docs with epoch 0 (the classic
    clamp), rate > 1 (``max_epochs`` permitting) REPLICATES each doc
    floor(rate) times plus one more for the md5-bucket fraction — the
    standard oversample-by-epochs treatment of rare domains, previously
    impossible here because rates silently clamped at 1.

    Scale shape: ONE aggregate over (key, tokens) — a per-domain frame
    of a handful of rows — broadcast back onto the corpus, then a pure
    codegen'd filter + sequence-explode (no Python, no shuffle of the
    data rows, no randomness). Copy counts depend only on (id, key), so
    re-runs, retries and other engines emit the identical multiset.
    Domains not in ``weights`` are dropped (their target share is zero).
    """
    rates = mixture_rates(
        df,
        weights,
        budget_tokens,
        token_col,
        key_col=key_col,
        n_buckets=n_buckets,
        max_epochs=max_epochs,
    )
    copies = F.col("_n_full") + F.when(
        sample_bucket(F.col(id_col), n_buckets) < F.col("_thr"), F.lit(1)
    ).otherwise(F.lit(0))
    # filter BEFORE the sequence: sequence(0, -1) would not be empty
    # (Spark infers a negative step), so zero-copy rows must never
    # reach the generator
    return (
        df.join(F.broadcast(rates), key_col)
        .withColumn("_copies", copies)
        .where(F.col("_copies") > 0)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(0), (F.col("_copies") - 1).cast("int"))),
        )
        .withColumn("epoch", F.col("epoch").cast("long"))
        .drop("_tokens", "_n_full", "_thr", "_copies")
    )
