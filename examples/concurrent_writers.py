"""Concurrent writers on one managed table: the optimistic-concurrency
contract in practice.

Every DML op stages its rewrite invisibly, then commits under the
table's commit lease with a re-validation of the affected buckets'
visible timeline — if another writer landed in the same bucket first,
the op raises ``ConcurrentWriteConflict`` with NOTHING announced (the
staged data is reclaimed). The idiomatic caller pattern is therefore a
retry loop: recompute against the current state and try again. Writers
touching DISJOINT buckets never conflict.

Run: python examples/concurrent_writers.py
"""

from __future__ import annotations

import os
import random
import sys
import tempfile
import threading
import time
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row

from druid_hadoop_utils_spark import load
from druid_hadoop_utils_spark.session import get_spark
from druid_hadoop_utils_spark.sources.dml import (
    ConcurrentWriteConflict,
    merge_into,
)
from druid_hadoop_utils_spark.sources.ingest import publish_segments

SPEC = {"granularity": "NONE", "dimensions": ["k"],
        "metrics": [{"name": "v", "type": "double"}]}


def upsert_with_retry(spark, root, updates, keys, attempts=5):
    """The recommended shape: a conflict means the table moved under
    you — re-running recomputes the rewrite from the CURRENT visible
    rows, so the retry composes with whatever the other writer did."""
    for attempt in range(attempts):
        try:
            return merge_into(spark, root, "t", updates, keys)
        except ConcurrentWriteConflict:
            time.sleep(random.uniform(0.05, 0.2) * (attempt + 1))
    raise RuntimeError(f"gave up after {attempts} conflicting attempts")


def main() -> None:
    spark = get_spark("concurrent-writers-example")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp()

    rows = [Row(ts=datetime(2024, 1, 1, h), k=f"k{h}", v=float(h))
            for h in range(1, 9)]
    publish_segments(spark.createDataFrame(rows), root, "t", version="v1",
                     time_column="ts", bucket="DAY")

    # two writers upsert DIFFERENT keys into the SAME day bucket at the
    # same time: the commit lease serializes their announcements, the
    # second committer sees the first's version in its re-validation and
    # conflicts, and its retry recomputes on top — no lost update, ever
    results = {}

    def writer(name: str, key: str, value: float) -> None:
        ups = spark.createDataFrame(
            [Row(__time=datetime(2024, 1, 1, 1), k=key, v=value)])
        results[name] = upsert_with_retry(spark, root, ups, ["k"])

    threads = [threading.Thread(target=writer, args=(f"w{i}", f"k{i}", 100.0 + i))
               for i in (1, 2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    df = load(spark, root, SPEC, interval="2024-01-01/2024-01-02",
              data_source="t")
    final = {r["k"]: r["v"] for r in df.collect()}
    print(f"writer announcements: { {n: len(ms) for n, ms in results.items()} }")
    print(f"k1={final['k1']} k2={final['k2']}  (both writers' updates survived)")
    assert final["k1"] == 101.0 and final["k2"] == 102.0


if __name__ == "__main__":
    main()
