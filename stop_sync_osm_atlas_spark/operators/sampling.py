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
