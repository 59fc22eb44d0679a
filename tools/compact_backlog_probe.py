"""Measure the auto_compact backlog batching (round 14, VERDICT r13
item 5).

Builds a table with N contiguous fragmented DAY buckets (7 small files
each — the shape a paused maintenance cron leaves behind), then runs the
advisor-driven compaction two ways on throwaway copies:

- per-interval: one compact_segments job per flagged day (the pre-r14
  behavior, forced via max_buckets_per_job=1);
- batched: contiguous days coalesce into ceil(N/cap) spanning jobs
  (the r14 default, cap 32).

Both must leave identical visible rows (asserted) and a clean advisor;
the probe prints one JSON line with wall seconds and job counts for
BASELINE.md. The win is fixed per-job overhead: each job pays a lease
acquire/renew, a manifest listing, a Spark job submission, and a
commit-lease registration — at 1000 flagged days that is 1000 of each
versus ~32.

Usage: python tools/compact_backlog_probe.py [n_days=30]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row

N_DAYS = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def _build(spark, root: str) -> None:
    import glob

    from druid_hadoop_utils_spark.sources.ingest import publish_segments

    rows = [Row(ts=datetime(2024, 1 + d // 28, 1 + d % 28, h),
                k=f"k{h}", v=float(d * 10 + h))
            for d in range(N_DAYS) for h in (1, 2, 3)]
    publish_segments(spark.createDataFrame(rows), root, "ev",
                     version="v1", time_column="ts", bucket="DAY")
    for seg in glob.glob(f"{root}/ev/2024-*/v=v1/shard=0"):
        f = glob.glob(f"{seg}/*.parquet")[0]
        for i in range(6):
            shutil.copy(f, f.replace("part-", f"x{i}-part-"))


def _state(spark, root: str):
    from pyspark.sql import functions as F

    from druid_hadoop_utils_spark import load

    spec = {"granularity": "NONE", "dimensions": ["k"],
            "metrics": [{"name": "v", "type": "double"}]}
    df = load(spark, root, spec, interval="2024-01-01/2025-01-01",
              data_source="ev")
    r = df.agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()[0]
    return int(r["n"]), float(r["s"])


def main() -> None:
    from druid_hadoop_utils_spark.session import get_spark
    from druid_hadoop_utils_spark.sources import maintenance as M

    spark = get_spark("compact-backlog-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="compact_backlog_")
    out: dict = {"metric": "auto_compact_backlog", "n_days": N_DAYS}
    base_state = None
    try:
        for label, cap in (("per_interval", 1), ("batched", 32)):
            root = os.path.join(work, label)
            _build(spark, root)
            if base_state is None:
                base_state = _state(spark, root)
            calls = []
            real = M.compact_segments

            def counting(s, r, ds, interval, **kw):
                calls.append(str(interval))
                return real(s, r, ds, interval, **kw)

            M.compact_segments = counting
            try:
                t0 = time.time()
                done = M.auto_compact(spark, root, "ev",
                                      min_file_bytes=1024 * 1024,
                                      max_buckets_per_job=cap)
                wall = time.time() - t0
            finally:
                M.compact_segments = real
            assert len(done) == N_DAYS, (label, len(done))
            assert _state(spark, root) == base_state, label
            assert M.compaction_candidates(
                root, "ev", min_file_bytes=1024 * 1024) == []
            out[label] = {"jobs": len(calls), "wall_sec": round(wall, 2)}
        out["speedup"] = round(
            out["per_interval"]["wall_sec"] / out["batched"]["wall_sec"], 2)
        out["load1"] = round(os.getloadavg()[0], 2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
