"""Exactly-once effects over the streaming change feed.

The feed's delivery is at-least-once: a batch that fails (or whose
Spark offset checkpoint is lost to a crash) replays with byte-identical
(from, to] stamp bounds. ``BatchLedger`` turns that into exactly-once
EFFECTS: the batch's durable output is committed under its stamp-pair
identity with one conditional create — a replayed batch finds the
entry and skips, a crashed half-batch reruns deterministically onto
the same commit point.

Here the consumer maintains a running (rows, score_sum) state whose
snapshots ARE the ledger payloads — the single-commit-point form where
exactly-once holds by construction. The script then simulates the
worst crash window (batch processed, Spark checkpoint lost) by
restoring a pre-batch copy of the checkpoint dir and draining again:
the replayed batch is detected and skipped, the state does not
double-count.

Run: python examples/exactly_once_consumer.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row, functions as F

from druid_hadoop_utils_spark.session import get_spark
from druid_hadoop_utils_spark.sources.dml import update_where
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.streaming.changes_source import (
    BatchLedger,
    stream_changes_foreach,
)

T1 = "2024-06-01T00:00:00+00:00"


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("exactly-once-consumer-example")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="eo_consumer_")
    ckpt = os.path.join(root, "_stream_ckpt")
    ledger = BatchLedger(os.path.join(root, "_feature_ledger"))

    rows = [Row(__time=datetime(2024, 1, 1 + d, h), doc_id=d * 100 + h,
                lang="en" if h % 2 else "de", score=float(h))
            for d in range(3) for h in range(4)]
    publish_segments(spark.createDataFrame(rows), root, "docs",
                     version="v1", bucket="DAY", published_at=T1)

    def process(feed, a, b):
        prev = ledger.latest()
        state = dict((prev or {"payload": {"rows": 0, "score": 0.0}})
                     ["payload"])
        if ledger.committed(a, b) is not None:
            print(f"  replay of committed batch ({a} -> {b}]: skipped")
            return
        d = feed.groupBy().agg(
            F.sum(F.when(F.col("_change_type") == "insert", F.col("_n"))
                  .otherwise(-F.col("_n"))).alias("dn"),
            F.sum(F.when(F.col("_change_type") == "insert",
                         F.col("score") * F.col("_n"))
                  .otherwise(-F.col("score") * F.col("_n"))).alias("ds")
        ).collect()[0]
        state["rows"] += int(d["dn"] or 0)
        state["score"] += float(d["ds"] or 0.0)
        if ledger.commit(a, b, state):   # THE single commit point
            print(f"  batch ({a} -> {b}]: state -> {state}")
        else:
            print(f"  lost the commit race for ({a} -> {b}]: discarded")

    def drain() -> None:
        q = stream_changes_foreach(
            spark, root, "docs", process, checkpoint_dir=ckpt,
            consumer_name="eo_features", available_now=True)
        q.awaitTermination(120)

    print("drain 1 (GENESIS snapshot):")
    drain()

    # snapshot the Spark checkpoint, then process one more batch
    backup = os.path.join(root, "_ckpt_backup")
    shutil.copytree(ckpt, backup)
    update_where(spark, root, "docs",
                 {"type": "selector", "dimension": "lang", "value": "de"},
                 set={"score": "score * 10"})
    print("drain 2 (the update's net changes):")
    drain()
    after = ledger.latest()["payload"]

    # THE CRASH WINDOW: batch 2's effects are durable (ledger committed)
    # but Spark's offset checkpoint write was lost
    shutil.rmtree(ckpt)
    shutil.copytree(backup, ckpt)
    print("drain 3 (replay after simulated checkpoint loss):")
    drain()

    final = ledger.latest()["payload"]
    assert final == after, (final, after)
    print(f"state after replay unchanged: {final} "
          f"({len(ledger.entries())} ledger entries)")
    spark.stop()


if __name__ == "__main__":
    main()
