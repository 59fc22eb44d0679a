"""Measure the column-projected change feed (round 15).

Builds a managed table whose rows carry a FAT text column (the shape
of a documents corpus), runs one DML cycle, then reads the change feed
twice — full row vs ``columns=["doc_id", "score"]`` — and prints both
walls plus the ratio. The projected read should win roughly in
proportion to the projected fraction of the row bytes, because the
projection reaches the parquet scan (ReadSchema pinned in
tests/test_round15_fixes.py); at 100 TB the same plan shape reads 2
columns of 50 instead of every changed file in full.

Usage: python tools/projected_feed_probe.py [n_docs=200000] [repeat=3]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

from pyspark.sql import functions as F

from druid_hadoop_utils_spark.session import get_spark
from druid_hadoop_utils_spark.sources.changes import read_changes
from druid_hadoop_utils_spark.sources.dml import update_where
from druid_hadoop_utils_spark.sources.ingest import publish_segments

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
REPEAT = int(sys.argv[2]) if len(sys.argv) > 2 else 3
T1 = "2024-06-01T00:00:00+00:00"


def main() -> None:
    spark = get_spark("projected-feed-probe")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="projfeed_")

    # ~1 KB of INCOMPRESSIBLE text per row (chained sha2 hex): repeated
    # lorem-ipsum filler dictionary/RLE-compresses to almost nothing in
    # parquet, which hides the pruning win this probe measures — the
    # fat column must cost real bytes on disk, as crawl text does
    text = F.concat(*[
        F.sha2(F.concat(F.col("id").cast("string"), F.lit(f"-{i}")), 256)
        for i in range(16)])
    df = (spark.range(N)
          .select(
              F.expr("timestamp'2024-01-01 00:00:00' + make_interval("
                     "0, 0, 0, CAST(id % 28 AS INT), 0, 0, 0)")
              .alias("__time"),
              F.col("id").alias("doc_id"),
              (F.col("id") % 5).cast("string").alias("lang"),
              text.alias("text"),
              (F.col("id") % 1000).cast("double").alias("score")))
    publish_segments(df, root, "docs", version="v1", bucket="DAY",
                     published_at=T1)
    # touch every bucket so the feed scans the whole corpus — the
    # projected win is then purely column pruning, not bucket pruning
    update_where(spark, root, "docs",
                 {"type": "selector", "dimension": "lang", "value": "3"},
                 set={"score": "score + 1"})

    def run(columns):
        best = float("inf")
        for _ in range(REPEAT):
            t0 = time.time()
            n = read_changes(spark, root, "docs", T1,
                             columns=columns).count()
            best = min(best, time.time() - t0)
        return best, n

    full_s, full_n = run(None)
    proj_s, proj_n = run(["doc_id", "score"])
    load1 = os.getloadavg()[0]
    print(json.dumps({
        "metric": "projected_feed_probe", "n_docs": N,
        "full_feed_sec": round(full_s, 3), "full_rows": full_n,
        "projected_sec": round(proj_s, 3), "projected_rows": proj_n,
        "speedup": round(full_s / proj_s, 2), "load1": round(load1, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
