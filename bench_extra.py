#!/usr/bin/env python
"""Extra benchmarks for optimization evidence (bench.py is FROZEN for
measurement — guide §1.4 noop-sink isolation and per-query best-of-N
live here instead).

Usage:
    python bench_extra.py q53_stream_dedup q19_sessionize   # timed queries
    python bench_extra.py --noop q02_corpus_prep            # noop sink
    python bench_extra.py --runs 5 q26_minhash_lsh

Methodology mirrors bench.py: local[$SPARK_GRAFT_CPUS], sf dir from
$SPARK_GRAFT_SF_DIR (default sf0.1), per-query best-of-N (default 3)
after a session warm-up, jobs labelled via setJobDescription. The timed
action is df.count() (bench.py's frozen action) unless --noop, which
uses df.write.format('noop') to force every column of every row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf signature resolution

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


# Python-side host-mode canary (VERDICT r6 item 2: the pure-JVM q01/q32
# canary under-corrects Python-heavy rows). A pinned Arrow-UDF pass over
# a fixed 200k-row range: plan frozen (range -> one pandas_udf -> agg),
# wall dominated by the Python worker path. Pin = best-of-3 on a clean
# session; compare py_canary_ratio across sessions the same way
# bench.py's canary_ratio is used. bench.py itself is frozen for
# measurement this round, so the canary ships here.
PY_CANARY_PINNED = 0.54


def _py_canary(spark) -> float:
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _work(x: pd.Series) -> pd.Series:
        return (x * 1.0000001).pow(0.5) + (x % 97)

    best = None
    for _ in range(3):
        t0 = time.time()
        (
            spark.range(200_000)
            .select(_work(F.col("id")).alias("v"))
            .agg(F.sum("v"))
            .collect()
        )
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--sf", default=SF_DIR)
    args = ap.parse_args()

    import __spark_entry__ as entry

    from stop_sync_osm_atlas_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]")
    spark.range(1000).count()
    qs = entry.queries()
    out: dict[str, dict] = {}
    for name in args.names:
        samples = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run {i + 1}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(samples), "samples": samples}
        print(f"[bench_extra] {name}: best={min(samples)} {samples}",
              file=sys.stderr, flush=True)
    pc = _py_canary(spark)
    print(json.dumps({"sf": args.sf, "cpus": CPUS, "noop": args.noop,
                      "queries": out, "py_canary_sec": pc,
                      "py_canary_ratio": round(pc / PY_CANARY_PINNED, 3)}))


if __name__ == "__main__":
    main()
