"""Strict merge with tiered fallbacks (J7).

Direct analog of the reference's GTFS->ATLAS stop mapping (reference
get_atlas_data.py:488-576 ``match_gtfs_to_atlas``):

- Tier 1 ``strict``       : inner equi-join on BOTH keys; every match
  kept (the reference keeps all strict rows too).
- Tier 2 ``unique_by_key``: for probe rows unmatched so far, if the
  build side has EXACTLY ONE row for the primary key, take it.
- Tier 3 ``suffix_token`` : else, among same-primary-key candidates,
  those whose build-id LAST ':'-token equals the probe's secondary key;
  deterministic tie-break = min build id (the reference takes
  ``iloc[0]`` — input-order dependent; min-id is the deterministic
  re-expression, same policy as near-dup rep election).

Spark shape (100 TB): three equi-joins + two anti-joins, all on the
primary key or the probe id — no cross join, no per-row Python. The
per-key candidate count rides the SAME groupBy aggregate that serves
tier 2, and the anti-joins are the standard remainder idiom (J10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def strict_merge_with_fallbacks(
    probe: DataFrame,
    build: DataFrame,
    probe_id: str = "probe_id",
    build_id: str = "build_id",
    key1: str = "k1",
    key2: str = "k2",
) -> DataFrame:
    """-> (probe_id, build_id, tier) with tier in
    ('strict', 'unique_by_key', 'suffix_token').

    Column contract: both frames carry ``key1``; probe carries ``key2``
    (matched against build's ``key2`` in tier 1 and against the last
    ':'-token of ``build_id`` in tier 3).
    """
    # rename per side: every tier below re-joins projections of the same
    # build frame, so unqualified shared names would trip Spark's
    # ambiguous-self-join detection
    p = probe.select(
        F.col(probe_id).alias("_pid"),
        F.col(key1).alias("_pk1"),
        F.col(key2).alias("_pk2"),
    )
    b = build.select(
        F.col(build_id).alias("_bid"),
        F.col(key1).alias("_bk1"),
        F.col(key2).alias("_bk2"),
    )

    strict = (
        p.join(b, (F.col("_pk1") == F.col("_bk1")) & (F.col("_pk2") == F.col("_bk2")))
        .select(
            F.col("_pid").alias(probe_id),
            F.col("_bid").alias(build_id),
            F.lit("strict").alias("tier"),
        )
    )

    rem1 = p.join(
        strict.select(F.col(probe_id).alias("_pid")), "_pid", "left_anti"
    )

    # one aggregate serves both the tier-2 gate (n == 1 -> the min IS
    # the only candidate) and the deterministic candidate id
    per_key = b.groupBy("_bk1").agg(
        F.count("*").alias("_n"), F.min("_bid").alias("_only")
    )
    uniq = (
        rem1.join(
            per_key.where(F.col("_n") == 1), F.col("_pk1") == F.col("_bk1")
        )
        .select(
            F.col("_pid").alias(probe_id),
            F.col("_only").alias(build_id),
            F.lit("unique_by_key").alias("tier"),
        )
    )

    rem2 = rem1.join(
        uniq.select(F.col(probe_id).alias("_pid")), "_pid", "left_anti"
    )
    # the id's last token joins as a SECOND equi key — a key1-only join
    # with the token as a residual filter would build a
    # |probe| x |candidates-per-key| intermediate (quadratic in group
    # size); two-key hashing keeps it linear. Null k2 never equi-matches,
    # which is exactly the reference's pd.notna(nref) gate.
    # try_cast the STRING token to key2's type, not the reverse: under
    # Spark 4 ANSI a plain `_pk2 == _btok` with a numeric key2 coerces
    # the token and THROWS CAST_INVALID_INPUT on the first build id
    # whose last token is non-numeric ('sloid:7000:west') — one such
    # row would kill the whole merge. try_cast makes it null, which
    # never equi-matches (the same no-match outcome the reference's
    # pd.notna gate produces); a string key2 compares unchanged.
    k2_type = dict(probe.dtypes)[key2]
    bt = b.withColumn(
        "_btok",
        F.element_at(F.split(F.col("_bid"), ":"), -1).try_cast(k2_type),
    )
    suffix = (
        rem2.join(
            bt,
            (F.col("_pk1") == F.col("_bk1")) & (F.col("_pk2") == F.col("_btok")),
        )
        .groupBy("_pid")
        .agg(F.min("_bid").alias(build_id))
        .select(
            F.col("_pid").alias(probe_id),
            F.col(build_id),
            F.lit("suffix_token").alias("tier"),
        )
    )

    return strict.unionByName(uniq).unionByName(suffix)
