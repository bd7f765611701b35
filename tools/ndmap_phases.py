#!/usr/bin/env python
"""Diagnostic mirror of neardup_phash_map's internal stages (round-5
linearity root-cause): times pass-1 (per-(sg,sub) clustering) and
pass-2 (per-sg rep merge) separately and reports the group-size
distribution that drives their quadratic terms.

NOT production code — a measurement harness that replicates the
operator body stage by stage (kept in sync by the ground-truth tests;
any drift shows up as different cluster outputs, which this script does
not grade). Usage: python tools/ndmap_phases.py <n_rows> [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import ND_KW, ensure_pairs, run_pipeline  # noqa: E402


def main() -> None:
    ns = [int(x) for x in sys.argv[1].split(",")]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from stop_sync_osm_atlas_spark.schemas import PAIRS_SCHEMA
    from stop_sync_osm_atlas_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]")
    run_pipeline(spark, ensure_pairs(2048), "/tmp/spark_graft_bench/out_probe_warm")
    for n in ns:
        one(spark, n, cpus, PAIRS_SCHEMA)


def one(spark, n: int, cpus: int, PAIRS_SCHEMA) -> None:
    from stop_sync_osm_atlas_spark.functions.image import decode_validate_inline
    from stop_sync_osm_atlas_spark.operators import neardup as nd

    pairs_path = ensure_pairs(n)
    pairs = spark.read.schema(PAIRS_SCHEMA).parquet(pairs_path)

    bits = 16
    sub_bits = nd.DEFAULT_SUB_BITS
    radius = 3
    hot_threshold = ND_KW.get("hot_threshold", nd.DEFAULT_HOT_THRESHOLD)
    mask = (1 << bits) - 1
    sub_mask = (1 << sub_bits) - 1
    out: dict = {"n": n, "cpus": cpus, "hot_threshold": hot_threshold}

    t0 = time.time()
    decode_validate_inline(pairs).write.mode("overwrite").format("noop").save()
    out["decode_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out), flush=True)

    slim0 = pairs.select("image_id", "phash").where(F.col("phash").isNotNull())
    pc = (
        slim0.groupBy("phash")
        .agg(F.count("*").alias("cnt"), F.min("image_id").alias("rep"))
        .withColumn("bucket", F.col("phash").bitwiseAND(F.lit(mask)).cast("int"))
        .persist()
    )

    t0 = time.time()
    probes = (
        pc.select(
            F.col("phash").alias("ph_a"),
            F.explode(
                __import__(
                    "stop_sync_osm_atlas_spark.functions.phash", fromlist=["x"]
                ).phash_bucket_probes(F.col("phash"), bits)
            ).alias("probe"),
            F.col("bucket").alias("bucket_a"),
        ).where(F.col("probe") > F.col("bucket_a"))
    )
    base = pc.select(F.col("phash").alias("ph_b"), F.col("bucket").alias("bucket_b"))
    bpairs = (
        probes.join(base, F.col("probe") == F.col("bucket_b"))
        .where(nd.hamming(F.col("ph_a"), F.col("ph_b")) <= F.lit(radius))
        .select(F.col("bucket_a").alias("a"), F.col("bucket_b").alias("b"))
        .distinct()
    )
    bp_rows = bpairs.limit(nd.SG_DRIVER_CC_MAX + 1).collect()
    out["sg_edges"] = len(bp_rows)
    out["sg_edges_sec"] = round(time.time() - t0, 2)
    sg_map = nd._driver_cc(bp_rows, spark) if bp_rows else None
    if sg_map is None:
        nodes = pc.withColumn("sg", F.col("bucket"))
    else:
        nodes = pc.join(
            F.broadcast(sg_map), pc["bucket"] == sg_map["node"], "left"
        ).select(
            "phash", "cnt", "rep",
            F.coalesce(sg_map["label"], pc["bucket"]).cast("int").alias("sg"),
        )

    sizes = nodes.groupBy("sg").agg(
        F.sum("cnt").alias("sg_n"), F.count("*").alias("dn")
    )
    ndf = nodes.join(F.broadcast(sizes), "sg").withColumn(
        "is_hot", F.col("sg_n") > F.lit(hot_threshold)
    )
    shr = F.shiftrightunsigned(F.col("phash"), bits)
    multi = ndf.where(F.col("dn") >= 2).withColumn(
        "sub",
        F.when(F.col("is_hot"), shr.bitwiseAND(F.lit(sub_mask)).cast("int"))
        .otherwise(F.lit(0)),
    )

    # group-size distribution: the quadratic driver
    t0 = time.time()
    gs = (
        multi.groupBy("sg", "sub")
        .agg(F.count("*").alias("k"))
        .agg(
            F.count("*").alias("n_groups"),
            F.max("k").alias("max_k"),
            F.sum(F.col("k") * F.col("k")).alias("sum_k2"),
            F.sum(F.when(F.col("k") > 16, F.col("k") * F.col("k"))).alias(
                "sum_k2_big"
            ),
        )
        .collect()[0]
    )
    out.update({k: gs[k] for k in ["n_groups", "max_k", "sum_k2", "sum_k2_big"]})
    out["groups_sec"] = round(time.time() - t0, 2)

    pass1_schema = (
        "phash long, cnt long, rep string, sg int, is_hot boolean, local_cluster string"
    )
    t0 = time.time()
    local = (
        multi.select("phash", "cnt", "rep", "sg", "is_hot", "sub")
        .repartition("sg", "sub")
        .sortWithinPartitions("sg", "sub")
        .mapInPandas(nd._cluster_partition(radius), schema=pass1_schema)
    ).persist()
    local.count()
    out["pass1_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    reps = local.where(
        F.col("is_hot") & (F.col("rep") == F.col("local_cluster"))
    ).select("sg", F.col("local_cluster").alias("orig_local"), "phash")
    rep_stats = reps.groupBy("sg").agg(F.count("*").alias("k")).agg(
        F.count("*").alias("n_hot_sgs"), F.max("k").alias("max_reps"),
        F.sum(F.col("k") * F.col("k")).alias("rep_k2"),
    ).collect()
    if rep_stats and rep_stats[0]["n_hot_sgs"] is not None:
        out.update({k: rep_stats[0][k] for k in ["n_hot_sgs", "max_reps", "rep_k2"]})
    out["rep_stats_sec"] = round(time.time() - t0, 2)
    print(json.dumps(out, default=str), flush=True)

    t0 = time.time()
    merged = reps.groupBy("sg").applyInPandas(
        lambda pdf: nd._merge_reps(pdf, 2 * radius),
        schema="sg int, orig_local string, global_cluster string",
    )
    merged.write.mode("overwrite").format("noop").save()
    out["pass2_sec"] = round(time.time() - t0, 2)

    local.unpersist()
    pc.unpersist()
    print(json.dumps(out, default=str), flush=True)


if __name__ == "__main__":
    main()
