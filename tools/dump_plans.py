"""Dump `.explain("formatted")` for bench HEADLINE queries to files.

Optimization-round evidence: captures the physical plan of every query in
bench.py's HEADLINE list (or the names given on the command line) into
``plans/<tag>/<query>_<suffix>.txt`` so plan-shape claims (Exchange count,
join strategy, PushedFilters, Python-boundary nodes) are checkable without
running Spark.

Usage: python tools/dump_plans.py <tag> <suffix> [sf_dir] [query ...]
  e.g. python tools/dump_plans.py r15 before /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "r15"
SUFFIX = sys.argv[2] if len(sys.argv) > 2 else "before"
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
ONLY = sys.argv[4:]


def main() -> None:
    from bench import HEADLINE
    from druid_hadoop_utils_spark.battery import QUERIES
    from druid_hadoop_utils_spark.session import get_spark

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", TAG)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")

    # optional override of the shared-materialization gate so the
    # at-scale plan shape can be captured on toy data (e.g. =0 forces
    # materialization regardless of input size)
    gate = os.environ.get("SPARK_GRAFT_SHARED_MIN_INPUT_BYTES")
    if gate is not None:
        from druid_hadoop_utils_spark.operators.shared import (
            MIN_INPUT_BYTES_CONF,
        )
        spark.conf.set(MIN_INPUT_BYTES_CONF, gate)

    names = ONLY or HEADLINE
    for name in names:
        fn, _ = QUERIES[name]
        spark.sparkContext.setJobDescription(f"plan: {name}")
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001 - record the failure inline
            plan = f"ERROR building plan: {exc!r}\n"
        path = os.path.join(out_dir, f"{name}_{SUFFIX}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange, "
              f"{plan.count('EvalPython') + plan.count('MapInPandas') + plan.count('MapInArrow')} py-nodes)",
              file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
