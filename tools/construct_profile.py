"""Plan-construction profiler (round 11).

Round 11 found that several battery queries spent MORE driver time
CONSTRUCTING their plans (py4j round-trips building Column expressions)
than executing them — ~32 s across the battery before the expr-string
fixes (kll_quantiles, qhist, simhash_table, minhash_table; BASELINE.md
round-11 sections). This tool keeps that regression visible: it times
two construction passes per battery query (no execution; min reported)
at sf0.001 — construction cost is data-independent — and prints the
worst offenders plus the battery-wide total.

Note: eagerly-iterative operators (connected_components inside
q_dedup_clusters / q_dedup_keep_best) EXECUTE during "construction" by
design; their numbers here are real work, not py4j waste.

Usage: python tools/construct_profile.py [top_n=15]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
TOP_N = int(sys.argv[1]) if len(sys.argv) > 1 else 15


def main() -> None:
    from druid_hadoop_utils_spark.battery import QUERIES
    from druid_hadoop_utils_spark.session import get_spark

    spark = get_spark("construct-profile", master="local[4]",
                      shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    errors = []
    for name, (fn, _sql) in QUERIES.items():
        try:
            t0 = time.perf_counter(); fn(spark, SF_DIR)
            c1 = time.perf_counter() - t0
            t0 = time.perf_counter(); fn(spark, SF_DIR)
            c2 = time.perf_counter() - t0
            rows.append((min(c1, c2), name))
        except Exception as e:  # pragma: no cover - report, don't die
            errors.append((name, type(e).__name__))
    rows.sort(reverse=True)
    print(json.dumps({
        "metric": "battery_construct_profile",
        "total_construct_sec": round(sum(c for c, _n in rows), 1),
        "queries_profiled": len(rows),
        "errors": errors,
        "top": {n: round(c, 3) for c, n in rows[:TOP_N]},
        "sf_dir": SF_DIR,
        "load1": os.getloadavg()[0],
    }))


if __name__ == "__main__":
    main()
