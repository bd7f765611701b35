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
6. Cross-bucket bridge (multi-probe): pairs within ``radius`` whose
   hashes differ in EXACTLY ONE bucket-window bit are re-found by
   exploding ``phash_bucket_probes`` (the bucket plus each 1-bit flip)
   on one side of a second blocking join; the resulting edges between
   pass-1/2 clusters are contracted by min-label propagation. Closes
   the single-bucket recall hole for the dominant (1-bit-in-window)
   case; pairs differing in ≥2 window bits remain a documented
   approximation (full radius-3 recall would need C(16,3) probes or
   4-band blocking with global connected components).

Scale notes (100 TB): pass 1 shuffles the full table once on
(bucket, sub) — the only full-data shuffle in the operator; pass 2
touches reps of salted buckets only (orders of magnitude smaller). The
bridge discovers edges on the DISTINCT (phash, bucket) projection of
the input (exact dups collapse first — a viral image with 10^6 copies
is one node, not 10^12 joined rows) with probe amplification on one
side only, halved by the smaller-bucket-owns-the-pair filter. Cluster
ids for the edges come from a MINI re-clustering of only the buckets an
edge touches (pass 1/2 are bucket-local, so the subset reproduces the
full run's ids exactly) — the main lineage stays lazy and its Python
pass pipelines with the caller's other stages. The edge graph —
cross-bucket near-dup cluster pairs, a vanishing fraction of rows — is
contracted by a driver union-find below BRIDGE_DRIVER_CC_MAX edges,
else by O(diameter) tiny-frame min-label iterations. The final attach
is a broadcast-able join of (cluster -> merged cluster); AQE skew-join
covers residual imbalance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.phash import (
    DEFAULT_BUCKET_BITS,
    DEFAULT_HAMMING_RADIUS,
    hamming,
    phash_bucket_probes,
)

DEFAULT_SUB_BITS = 8
DEFAULT_HOT_THRESHOLD = 4096
# Bridge edge graphs below this size are contracted on the driver (one
# collect of the aggregated cluster-pair list); above it the
# distributed min-label loop runs. 100k edges ≈ a few MB of ids.
BRIDGE_DRIVER_CC_MAX = 100_000


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
    slim0 = pairs.select(
        "image_id",
        "phash",
        F.col("phash").bitwiseAND(F.lit(mask)).cast("int").alias("bucket"),
    ).where(F.col("phash").isNotNull())
    slim = slim0

    # Bucket-size pre-count: tiny (<= 2^bits rows) -> broadcast join back.
    # Persisted because it feeds two consumers (the broadcast join and
    # the has_hot probe below) — without the cache the slim projection
    # would be scanned and shuffled twice.
    sizes = (
        slim.groupBy("bucket").agg(F.count("*").alias("bucket_n")).persist()
    )
    slim = slim.join(F.broadcast(sizes), "bucket").withColumn(
        "is_hot", F.col("bucket_n") > F.lit(hot_threshold)
    )

    # Pass 2 gate: a tiny driver-side probe on the persisted
    # (<= 2^bits row) sizes aggregate.
    has_hot = sizes.where(F.col("bucket_n") > F.lit(hot_threshold)).limit(1).count() > 0

    def _pass12(sl: DataFrame) -> DataFrame:
        """(image_id, phash, bucket, bucket_n, is_hot) -> resolved
        (image_id, phash, bucket, cluster_id).

        Bucket-local by construction: running it on any bucket-closed
        subset reproduces the full run's cluster ids for those buckets
        exactly (pass 3 below exploits this to stay lazy).
        """
        # Singleton buckets (the overwhelming majority of a web corpus)
        # never enter the Python clustering path: their cluster is
        # themselves. This is the blocking no-op case the reference also
        # short-circuits (exact_matching.py: groups with one candidate).
        singles = sl.where(F.col("bucket_n") == 1).select(
            "image_id",
            "phash",
            "bucket",
            F.lit(False).alias("is_hot"),
            F.col("image_id").alias("local_cluster"),
        )
        multi = sl.where(F.col("bucket_n") >= 2)
        shr = F.shiftrightunsigned(F.col("phash"), bits)
        multi = multi.withColumn(
            "sub",
            F.when(
                F.col("is_hot"), shr.bitwiseAND(F.lit(sub_mask)).cast("int")
            ).otherwise(F.lit(0)),
        )
        pass1_schema = (
            "image_id string, phash long, bucket int, is_hot boolean,"
            " local_cluster string"
        )
        local = (
            multi.select("image_id", "phash", "bucket", "is_hot", "sub")
            .repartition("bucket", "sub")
            .sortWithinPartitions("bucket", "sub")
            .mapInPandas(_cluster_partition(radius), schema=pass1_schema)
        )
        local = local.unionByName(singles)

        # Pass 2 (salted hot buckets only): merge sub-clusters via reps.
        if not has_hot:
            return local.select(
                "image_id",
                "phash",
                "bucket",
                F.col("local_cluster").alias("cluster_id"),
            )
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
        return local.join(
            merged,
            (local["bucket"] == merged["bucket"])
            & (local["local_cluster"] == merged["orig_local"]),
            "left",
        ).select(
            local["image_id"],
            local["phash"],
            local["bucket"],
            F.coalesce(merged["global_cluster"], local["local_cluster"]).alias(
                "cluster_id"
            ),
        )

    resolved = _pass12(slim)

    # Pass 3: cross-bucket bridge. Re-find pairs whose hashes differ in
    # exactly one bucket-window bit (the dominant recall miss of any
    # single-bucket blocking). Edge DISCOVERY runs on the distinct-phash
    # projection of the INPUT — not on pass-1 output — so the common
    # no-cross-pair case costs one slim probe join and never eagerly
    # materializes the Python clustering stage. Deduping by phash first
    # also bounds the probe join: a viral image with 10^6 exact copies
    # contributes ONE node, not 10^12 joined rows.
    ph_nodes = slim0.select("phash", "bucket").distinct()
    probes = ph_nodes.select(
        F.col("phash").alias("ph_a"),
        F.explode(phash_bucket_probes(F.col("phash"), bits)).alias("probe"),
        F.col("bucket").alias("bucket_a"),
        # each unordered cross-bucket pair surfaces exactly once: the
        # partner with the SMALLER bucket owns it, so keep only probes
        # that increase the bucket value — this also halves the probe
        # shuffle volume before the join (filter runs pre-exchange)
    ).where(F.col("probe") > F.col("bucket_a")).drop("bucket_a")
    base = ph_nodes.select(
        F.col("phash").alias("ph_b"), F.col("bucket").alias("bucket_b")
    )
    img_edges = (
        probes.join(base, F.col("probe") == F.col("bucket_b"))
        .where(hamming(F.col("ph_a"), F.col("ph_b")) <= F.lit(radius))
        .select("ph_a", "ph_b")
        .persist()
    )
    n_img_edges = img_edges.count()
    if n_img_edges > 0:
        # Mini re-clustering of ONLY the buckets an edge touches: pass
        # 1/2 are bucket-local, so re-running them on the bucket-closed
        # subset reproduces the full run's cluster ids for those buckets
        # exactly. This keeps the MAIN lineage lazy — its Python pass
        # pipelines with the caller's other stages (e.g. image decode in
        # the cascade) instead of being materialized eagerly here.
        eb = (
            img_edges.select(
                F.col("ph_a").bitwiseAND(F.lit(mask)).cast("int").alias("bucket")
            )
            .unionByName(
                img_edges.select(
                    F.col("ph_b").bitwiseAND(F.lit(mask)).cast("int").alias("bucket")
                )
            )
            .distinct()
        )
        mini = _pass12(slim.join(F.broadcast(eb), "bucket"))
        # phash -> cluster is functional (equal hashes share bucket and
        # always merge in pass 1), so a distinct projection maps the
        # phash-level edges to cluster-level edges.
        ph2cl = mini.select("phash", "cluster_id").distinct()
        a = ph2cl.select(
            F.col("phash").alias("ph_a"), F.col("cluster_id").alias("cluster_a")
        )
        b = ph2cl.select(
            F.col("phash").alias("ph_b"), F.col("cluster_id").alias("cluster_b")
        )
        edges = (
            img_edges.join(a, "ph_a")
            .join(b, "ph_b")
            .where(F.col("cluster_a") != F.col("cluster_b"))
            .select(
                F.least("cluster_a", "cluster_b").alias("a"),
                F.greatest("cluster_a", "cluster_b").alias("b"),
            )
            .distinct()
        )
        if n_img_edges <= BRIDGE_DRIVER_CC_MAX:
            # The edge list is an AGGREGATED distinct cluster-pair graph
            # (never raw rows, and no larger than n_img_edges); under the
            # cap a single bounded collect + driver union-find replaces
            # the iterative job loop.
            mapping = _driver_cc(edges)
        else:
            mapping = _cc_min_label(edges.persist())
        resolved = resolved.join(
            # bounded by the number of cross-bucket near-dup clusters —
            # a vanishing fraction of the corpus, safe to broadcast
            F.broadcast(mapping),
            resolved["cluster_id"] == mapping["node"],
            "left",
        ).select(
            resolved["image_id"],
            F.coalesce(mapping["label"], resolved["cluster_id"]).alias("cluster_id"),
        )
    else:
        resolved = resolved.select("image_id", "cluster_id")
    img_edges.unpersist()

    # cluster size + rep flag in ONE shuffle (window over cluster_id)
    win = W.partitionBy("cluster_id")
    return resolved.select(
        "image_id",
        "cluster_id",
        F.count("*").over(win).cast("int").alias("cluster_size"),
        (F.col("image_id") == F.col("cluster_id")).alias("is_cluster_rep"),
    )


def _driver_cc(edges: DataFrame) -> DataFrame:
    """Union-find on a small collected edge list -> (node, label) frame.

    Same contract as _cc_min_label (label = min node id of the
    component); used below BRIDGE_DRIVER_CC_MAX where a Python loop
    beats several distributed join jobs.
    """
    rows = edges.collect()
    idx: dict[object, int] = {}
    for r in rows:
        idx.setdefault(r["a"], len(idx))
        idx.setdefault(r["b"], len(idx))
    parent = list(range(len(idx)))

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for r in rows:
        ri, rj = find(idx[r["a"]]), find(idx[r["b"]])
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    comp_min: dict[int, object] = {}
    for node, i in idx.items():
        root = find(i)
        cur = comp_min.get(root)
        if cur is None or node < cur:
            comp_min[root] = node
    out = pd.DataFrame(
        {
            "node": list(idx.keys()),
            "label": [comp_min[find(i)] for i in idx.values()],
        }
    )
    return edges.sparkSession.createDataFrame(out)


def _cc_min_label(edges: DataFrame) -> DataFrame:
    """Connected components over a small undirected edge list.

    Min-label propagation to fixpoint: every node ends with the minimum
    node id of its component — the same rep-election contract as the
    per-bucket union-find. Caller persists `edges`; each iteration
    localCheckpoints the <=|V|-row label frame so lineage stays flat.
    Iteration count = graph diameter (bridge graphs are tiny stars).
    """
    und = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).persist()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    while True:
        nbr = (
            und.join(labels, und["b"] == labels["node"])
            .groupBy(und["a"])
            .agg(F.min("label").alias("nbr_min"))
        )
        new = labels.join(nbr, labels["node"] == nbr["a"], "left").select(
            labels["node"],
            labels["label"].alias("old"),
            F.least(
                labels["label"], F.coalesce(nbr["nbr_min"], labels["label"])
            ).alias("label"),
        ).localCheckpoint()
        if new.where(F.col("label") < F.col("old")).limit(1).count() == 0:
            und.unpersist()
            return new.select("node", "label")
        labels = new.select("node", "label")


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
