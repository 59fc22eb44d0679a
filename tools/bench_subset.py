"""Focused bench: time the named queries with bench.py's exact
methodology (noop sink, min-of-N after session warm-up) without paying
for the whole battery. For optimization-round before/after comparisons.

Usage: python tools/bench_subset.py q_name [q_name ...] [--repeats N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from druid_hadoop_utils_spark.battery import QUERIES
    from druid_hadoop_utils_spark.session import get_spark

    # accept both --repeats=N and --repeats N (r15 ADVICE: the bare-flag
    # form crashed on split and leaked N into the query list)
    argv = sys.argv[1:]
    args: list[str] = []
    repeats = 3
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--repeats":
            repeats = int(argv[i + 1])
            i += 2
            continue
        if a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
        elif not a.startswith("--"):
            args.append(a)
        i += 1

    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py: executor threads, codegen, parquet footer
    # cache, and the Python/Arrow worker pool
    warm_fn, _ = QUERIES["q_scan_interval_project"]
    warm_fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.range(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in args:
        fn, _ = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench: {name}")
        best = None
        for _ in range(repeats):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)
    print(json.dumps({"queries": timings,
                      "load1": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
