#!/usr/bin/env python
"""Phase-timing probe for the data-size linearity question (round-5
follow-up to BENCH/BASELINE.md "Data-size linearity"): where does the
per-row rate go between 800k and 6.4M rows?

Phases, each a separate Spark job on the same warmed session:
  scan     parquet scan + count (I/O floor)
  decode   decode_validate_inline fully materialized (the Arrow pass)
  ndmap    neardup_phash_map build (node-level dedup; reports n_map)
  full     run_pipeline (decode + ndmap + attach + rules + write)

Variants (env SPARK_GRAFT_PROBE_VARIANT):
  default          as shipped
  shuffled_attach  force the phash-map attach onto the shuffled-join
                   path (ATTACH_BROADCAST_MAX_ROWS=0) — isolates the
                   broadcast cost of a multi-million-row map
  no_checkpoint    replace the map's localCheckpoint with a DISK_ONLY
                   persist — isolates executor-storage pressure

Usage: python tools/linearity_probe.py <n_rows> [cpus]
Prints one JSON line. NEVER run two probes concurrently.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ND_KW, ensure_pairs, run_pipeline  # noqa: E402


def main() -> None:
    ns = [int(x) for x in sys.argv[1].split(",")]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    variant = os.environ.get("SPARK_GRAFT_PROBE_VARIANT", "default")

    from stop_sync_osm_atlas_spark.functions.image import decode_validate_inline
    from stop_sync_osm_atlas_spark.operators import neardup
    from stop_sync_osm_atlas_spark.schemas import PAIRS_SCHEMA
    from stop_sync_osm_atlas_spark.session import get_spark

    if variant == "shuffled_attach":
        neardup.ATTACH_BROADCAST_MAX_ROWS = 0
    elif variant == "no_checkpoint":
        import pyspark.sql.classic.dataframe as cdf
        from pyspark import StorageLevel

        def _persist_instead(self, eager=True):
            df = self.persist(StorageLevel.DISK_ONLY)
            if eager:
                df.count()
            return df

        cdf.DataFrame.localCheckpoint = _persist_instead

    spark = get_spark(master=f"local[{cpus}]")

    # warm-up: tiny full pipeline (codegen + Python daemons), as bench.py
    warm = ensure_pairs(2048)
    run_pipeline(spark, warm, "/tmp/spark_graft_bench/out_probe_warm")

    for n in ns:
        _one(spark, n, cpus, variant, decode_validate_inline, neardup, PAIRS_SCHEMA)


def _one(spark, n, cpus, variant, decode_validate_inline, neardup, PAIRS_SCHEMA):
    pairs_path = ensure_pairs(n)
    pairs = spark.read.schema(PAIRS_SCHEMA).parquet(pairs_path)
    out: dict = {"n": n, "cpus": cpus, "variant": variant}

    t0 = time.time()
    out["rows"] = pairs.count()
    out["scan_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    decode_validate_inline(pairs).write.mode("overwrite").format("noop").save()
    out["decode_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    ph_map, n_map = neardup.neardup_phash_map(pairs, **ND_KW)
    out["ndmap_sec"] = round(time.time() - t0, 2)
    out["n_map"] = n_map
    # release the standalone phase's map BEFORE timing the full run:
    # (a) under the no_checkpoint variant the persist substitute
    # registers it in the CacheManager, and run_pipeline's canonically
    # identical ph_map plan would be SUBSTITUTED with the cached
    # relation — full_sec would silently exclude the whole map build in
    # that variant only, inverting the probe's A/B; (b) even in the
    # default variant the materialized blocks would occupy executor
    # storage during the full timing, contaminating the storage-
    # pressure question the variants isolate.
    try:
        ph_map.unpersist()
    except Exception:
        pass
    del ph_map
    import gc

    gc.collect()
    spark.sparkContext._jvm.System.gc()

    t0 = time.time()
    run_pipeline(spark, pairs_path, "/tmp/spark_graft_bench/out_probe")
    out["full_sec"] = round(time.time() - t0, 2)
    out["residual_sec"] = round(
        out["full_sec"] - out["decode_sec"] - out["ndmap_sec"], 2
    )
    out["images_per_sec"] = round(out["rows"] / out["full_sec"], 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
