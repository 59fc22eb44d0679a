"""Exactly-once effects over the streaming change feed.

Two defense layers compose here:

1. A NAMED stream's replay bounds CLAMP to its registered consumer
   checkpoint (stream_changes_foreach, round 15): a replayed trigger
   whose work the registry already covers is skipped whole, and a
   widened replay (offset rollback + new publishes before restart) is
   narrowed to the unprocessed suffix. This alone makes completed
   batches effectively-once.
2. ``BatchLedger`` closes the residual window — a crash between the
   batch's external effect and the in-band registry commit, or an
   unnamed stream: the batch's durable output commits under its
   (from, to] stamp-pair identity with one conditional create, so a
   re-delivered batch finds the entry and skips, and a crashed
   half-batch reruns deterministically onto the same commit point.

The consumer below maintains a running (rows, score_sum) state whose
snapshots ARE the ledger payloads — the single-commit-point form where
exactly-once holds by construction. The script simulates BOTH crash
shapes: a pure offset loss (drain 3 — the wrapper clamp skips the
trigger entirely) and an offset loss followed by a new publish
(drain 4 — the wrapper narrows to the fresh suffix and the ledger
folds only the missing delta).

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

    # CRASH SHAPE 1: batch 2's effects are durable (ledger + registry
    # committed) but Spark's offset checkpoint write was lost. The
    # wrapper clamp skips the replayed trigger before `process` runs.
    shutil.rmtree(ckpt)
    shutil.copytree(backup, ckpt)
    print("drain 3 (replay after offset loss — wrapper clamp skips):")
    drain()
    final = ledger.latest()["payload"]
    assert final == after, (final, after)
    print(f"  state unchanged: {final} "
          f"({len(ledger.entries())} ledger entries)")

    # CRASH SHAPE 2: offset loss AND a new publish before restart — the
    # replayed trigger widens past the committed batch; the wrapper
    # narrows delivery to the unprocessed suffix and the ledger folds
    # only the missing delta (a fresh stamp pair).
    shutil.rmtree(ckpt)
    shutil.copytree(backup, ckpt)
    update_where(spark, root, "docs",
                 {"type": "selector", "dimension": "lang", "value": "en"},
                 set={"score": "score + 100"})
    print("drain 4 (widened replay — narrowed to the fresh suffix):")
    drain()
    final = ledger.latest()["payload"]
    assert final["rows"] == 12 and final["score"] == after["score"] + 600
    print(f"  state folded once: {final} "
          f"({len(ledger.entries())} ledger entries)")
    spark.stop()


if __name__ == "__main__":
    main()
