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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


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
    print(json.dumps({"sf": args.sf, "cpus": CPUS, "noop": args.noop,
                      "queries": out}))


if __name__ == "__main__":
    main()
