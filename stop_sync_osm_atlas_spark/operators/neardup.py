"""phash-bucketed near-duplicate clustering with explicit skew salting.

The engine's analog of the reference's entity-matching join stack:
UIC blocking (reference exact_matching.py:25-57) -> phash low-bit
blocking; KDTree 50 m radius probe (reference spatial_index.py:21-42,
distance_matching.py:459-514) -> Hamming-radius graph; per-group
reciprocal/conflict-free assignment (reference
distance_matching.py:220-377 process_group_matches, a genuinely
non-relational per-group algorithm) -> per-bucket connected components
in a grouped-map pandas UDF; best-match representative election + group
propagation (reference matching_script.py:404-467) -> min-image_id rep
election + decision propagation.

Deterministic algorithm contract (mirrored 1:1 by oracle/oracle.py):

1. ``bucket  = phash & (2^bits - 1)``.
2. Buckets larger than ``hot_threshold`` are *salted* with a secondary
   deterministic key ``sub = (phash >> bits) & (2^sub_bits - 1)``
   (mandated skew handling: a Zipfian hot bucket — FIXTURES.md plants
   one holding ~5% of rows — would otherwise pin a single task).
3. Within each (bucket, sub): connected components over edges
   ``hamming(phash_i, phash_j) <= radius``.
4. Component id = min image_id (string order) — the deterministic
   rep-election analog of min-by-distance (reference
   matching_script.py:409-431).
5. Merge pass for salted buckets only: component reps re-cluster within
   the bucket with threshold ``2*radius`` (star-shaped clusters — every
   member within ``radius`` of a base — merge exactly; chain shapes may
   split across salts: documented LSH-style approximation).

Scale notes (100 TB): pass 1 shuffles the full table once on
(bucket, sub) — the only full-data shuffle in the operator; pass 2
touches reps of salted buckets only (orders of magnitude smaller); the
final attach is a broadcast-able join of (image_id -> cluster) when the
dup fraction is small, else a shuffled hash join co-partitioned on
image_id. AQE skew-join covers residual imbalance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.phash import DEFAULT_BUCKET_BITS, DEFAULT_HAMMING_RADIUS

DEFAULT_SUB_BITS = 8
DEFAULT_HOT_THRESHOLD = 4096


_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def _popcount64(a: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount (numpy<2 has no bitwise_count)."""
    if hasattr(np, "bitwise_count"):
        return np.bitwise_count(a)
    x = a.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & _M1
    x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
    x = (x + (x >> np.uint64(4))) & _M4
    return ((x * _H01) >> np.uint64(56)).astype(np.int64)


def _components(phashes: np.ndarray, radius: int) -> tuple[np.ndarray, bool]:
    """Union-find connected components, O(n^2) Hamming within a group.

    Groups are bounded by hot_threshold (pass 1) / rep count (pass 2),
    so the quadratic stays in-cache per task. Returns (roots, merged):
    merged=False means every row is its own component (the common case,
    letting callers skip the min-per-component pass entirely).
    """
    n = len(phashes)
    parent = np.arange(n)
    merged = False

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    x = phashes.astype(np.uint64)
    for i in range(n - 1):
        d = _popcount64(np.bitwise_xor(x[i + 1 :], x[i]))
        for j in np.nonzero(d <= radius)[0]:
            ri, rj = find(i), find(int(j) + i + 1)
            if ri != rj:
                parent[rj] = ri
                merged = True
    if not merged:
        return parent, False
    return np.array([find(i) for i in range(n)]), True


def _cluster_partition(radius: int):
    """mapInPandas partition function: one Python call per PARTITION.

    Input must be hash-partitioned AND sorted by (bucket, sub) so every
    group is a contiguous slice. Grouped-map applyInPandas costs ~ms of
    Arrow/pandas overhead per group; with millions of tiny buckets that
    overhead dominates, so we batch all groups of a partition into one
    call and slice with numpy (measured ~10x on the sf0.1 bench).
    """

    def _fn(it):
        pdfs = list(it)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        bucket = pdf["bucket"].to_numpy()
        sub = pdf["sub"].to_numpy()
        ph = pdf["phash"].to_numpy()
        ids = pdf["image_id"].to_numpy(dtype=object)
        out = ids.copy()  # default: own cluster (singleton groups)
        change = np.flatnonzero((bucket[1:] != bucket[:-1]) | (sub[1:] != sub[:-1]))
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [len(pdf)]))
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            roots, any_merge = _components(ph[s:e], radius)
            if not any_merge:
                continue  # all singleton components: out already == ids
            grp = ids[s:e]
            mins: dict[int, object] = {}
            for k, r in enumerate(roots):
                v = grp[k]
                cur = mins.get(r)
                if cur is None or v < cur:
                    mins[r] = v
            out[s:e] = [mins[r] for r in roots]
        yield pd.DataFrame(
            {
                "image_id": ids,
                "phash": ph,
                "bucket": bucket,
                "is_hot": pdf["is_hot"].to_numpy(),
                "local_cluster": out,
            }
        )

    return _fn


def neardup_clusters(
    pairs: DataFrame,
    bits: int = DEFAULT_BUCKET_BITS,
    radius: int = DEFAULT_HAMMING_RADIUS,
    sub_bits: int = DEFAULT_SUB_BITS,
    hot_threshold: int = DEFAULT_HOT_THRESHOLD,
) -> DataFrame:
    """pairs -> (image_id, cluster_id, cluster_size, is_cluster_rep).

    Input needs (image_id, phash); all other columns are pruned before
    the shuffle (shuffle only 2 columns of the 100 TB table, not bytes).
    """
    mask = (1 << bits) - 1
    sub_mask = (1 << sub_bits) - 1
    slim = pairs.select(
        "image_id",
        "phash",
        F.col("phash").bitwiseAND(F.lit(mask)).cast("int").alias("bucket"),
    ).where(F.col("phash").isNotNull())

    # Bucket-size pre-count: tiny (<= 2^bits rows) -> broadcast join back.
    sizes = slim.groupBy("bucket").agg(F.count("*").alias("bucket_n"))
    slim = slim.join(F.broadcast(sizes), "bucket").withColumn(
        "is_hot", F.col("bucket_n") > F.lit(hot_threshold)
    )

    # Singleton buckets (the overwhelming majority of a web corpus) never
    # enter the Python clustering path: their cluster is themselves.
    # This is the blocking no-op case the reference also short-circuits
    # (exact_matching.py: groups with a single candidate).
    singles = slim.where(F.col("bucket_n") == 1).select(
        "image_id",
        "phash",
        "bucket",
        F.lit(False).alias("is_hot"),
        F.col("image_id").alias("local_cluster"),
    )

    multi = slim.where(F.col("bucket_n") >= 2)
    shr = F.shiftrightunsigned(F.col("phash"), bits)
    multi = multi.withColumn(
        "sub",
        F.when(F.col("is_hot"), shr.bitwiseAND(F.lit(sub_mask)).cast("int")).otherwise(
            F.lit(0)
        ),
    )

    pass1_schema = (
        "image_id string, phash long, bucket int, is_hot boolean, local_cluster string"
    )
    local = (
        multi.select("image_id", "phash", "bucket", "is_hot", "sub")
        .repartition("bucket", "sub")
        .sortWithinPartitions("bucket", "sub")
        .mapInPandas(_cluster_partition(radius), schema=pass1_schema)
    )
    local = local.unionByName(singles)

    # Pass 2 (salted hot buckets only): merge sub-clusters via reps.
    # Skipped entirely when no bucket exceeded the threshold — a tiny
    # driver-side probe on the (<= 2^bits row) sizes aggregate.
    has_hot = sizes.where(F.col("bucket_n") > F.lit(hot_threshold)).limit(1).count() > 0
    if has_hot:
        # diamond plan: `local` feeds both the rep extraction and the
        # final join — persist so the Python pass 1 runs once, not twice
        # (Spark reuses exchanges, not post-shuffle Python stages)
        local = local.persist()
        reps = local.where(
            F.col("is_hot") & (F.col("image_id") == F.col("local_cluster"))
        ).select("bucket", F.col("local_cluster").alias("orig_local"), "phash")
        merged = reps.groupBy("bucket").applyInPandas(
            lambda pdf: _merge_reps(pdf, 2 * radius),
            schema="bucket int, orig_local string, global_cluster string",
        )
        resolved = local.join(
            merged,
            (local["bucket"] == merged["bucket"])
            & (local["local_cluster"] == merged["orig_local"]),
            "left",
        ).select(
            local["image_id"],
            F.coalesce(merged["global_cluster"], local["local_cluster"]).alias(
                "cluster_id"
            ),
        )
    else:
        resolved = local.select(
            "image_id", F.col("local_cluster").alias("cluster_id")
        )

    # cluster size + rep flag in ONE shuffle (window over cluster_id)
    win = W.partitionBy("cluster_id")
    return resolved.select(
        "image_id",
        "cluster_id",
        F.count("*").over(win).cast("int").alias("cluster_size"),
        (F.col("image_id") == F.col("cluster_id")).alias("is_cluster_rep"),
    )


def _merge_reps(pdf: pd.DataFrame, radius2: int) -> pd.DataFrame:
    roots, _ = _components(pdf["phash"].to_numpy(), radius2)
    # global cluster = min local_cluster id (== min image_id of members,
    # since local ids are themselves min image_ids)
    glob = (
        pd.Series(pdf["orig_local"].to_numpy(dtype=object))
        .groupby(roots)
        .transform("min")
        .to_numpy(dtype=object)
    )
    return pd.DataFrame(
        {
            "bucket": pdf["bucket"].to_numpy(),
            "orig_local": pdf["orig_local"].to_numpy(dtype=object),
            "global_cluster": glob,
        }
    )
