"""Same-process alternating engine-vs-plain pair sweep — the ≤2×-gate
evidence for BASELINE.md, reproducible instead of ad-hoc.

For every headline query that has a plain-PySpark twin in
tools/baseline.py, runs engine and plain ALTERNATING in one session
(removes machine drift and warmth asymmetry), min-of-N per side after a
warm-up pass, and prints one JSON line with per-pair ratios plus the
aggregate.

Usage: SPARK_GRAFT_SF_DIR=... python tools/pair_sweep.py [repeats=3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def main() -> None:
    from druid_hadoop_utils_spark import battery
    from druid_hadoop_utils_spark.session import get_spark
    from tools.baseline import build_baseline

    spark = get_spark("pair-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    plain = build_baseline(spark, SF_DIR)
    pairs = [(n, battery.QUERIES[n][0], p)
             for n, p in plain.items() if n in battery.QUERIES]

    def run_engine(fn):
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    def run_plain(fn):
        fn().write.format("noop").mode("overwrite").save()

    # warm both sides once (codegen, Python workers, ANN index caches)
    for _, e, p in pairs:
        run_engine(e)
        run_plain(p)

    out = {}
    for name, e, p in pairs:
        eb = pb = float("inf")
        for _ in range(REPEATS):  # alternating: e, p, e, p, ...
            t = time.time(); run_engine(e); eb = min(eb, time.time() - t)
            t = time.time(); run_plain(p); pb = min(pb, time.time() - t)
        out[name] = {"engine": round(eb, 3), "plain": round(pb, 3),
                     "ratio": round(eb / pb, 2)}
        print(f"# {name}: engine {eb:.3f}s plain {pb:.3f}s "
              f"ratio {eb / pb:.2f}x", file=sys.stderr)

    etot = sum(v["engine"] for v in out.values())
    ptot = sum(v["plain"] for v in out.values())
    print(json.dumps({
        "metric": "engine_vs_plain_pair_sweep",
        "pairs": len(out),
        "engine_total_sec": round(etot, 3),
        "plain_total_sec": round(ptot, 3),
        "aggregate_ratio": round(etot / ptot, 2),
        "worst_pair": max(out, key=lambda n: out[n]["ratio"]),
        "worst_ratio": max(v["ratio"] for v in out.values()),
        "queries": out,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "load1": os.getloadavg()[0],
    }))


if __name__ == "__main__":
    main()
