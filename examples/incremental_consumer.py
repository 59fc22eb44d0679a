"""Incremental consumption of a managed table via the change feed.

A downstream job (feature builder, index refresher, replica sync) that
must process a 100 TB corpus CANNOT re-read it per run. The change-feed
consumer loop processes only what changed:

    feed, token = consume_changes(spark, root, ds, checkpoint)
    ...process feed...             # O(changed bytes)
    commit_consumed(checkpoint, token)

- First run delivers the full current view as inserts (baseline build).
- Every later run delivers ONLY the net row changes since the last
  committed checkpoint — compaction/restore rewrites cancel to an empty
  feed, DML yields exactly its updates/deletes/inserts.
- Crash before ``commit_consumed`` → the same feed recomputes next run
  (at-least-once; make the processing idempotent, e.g. key the sink by
  doc id).

Run: python examples/incremental_consumer.py
"""

from __future__ import annotations

import os
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row, functions as F

from druid_hadoop_utils_spark.session import get_spark
from druid_hadoop_utils_spark.sources.changes import (
    commit_consumed,
    consume_changes,
    consumer_checkpoint_path,
)
from druid_hadoop_utils_spark.sources.dml import delete_where, update_where
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.maintenance import compact_segments


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("incremental-consumer-example")
    root = tempfile.mkdtemp(prefix="chg_example_")
    # REGISTERED checkpoint (consumer_checkpoint_path → <root>/docs/
    # _consumers/): discoverable by list_consumers and protected by
    # maintain_table's vacuum floor — an ad-hoc path would also work
    # but must size retention itself
    ckpt = consumer_checkpoint_path(root, "docs", "feature_builder")

    rows = [Row(__time=datetime(2024, 1, d, h), doc_id=d * 100 + h,
                lang="en" if h % 2 else "de", score=float(h))
            for d in (1, 2, 3) for h in range(4)]
    publish_segments(spark.createDataFrame(rows), root, "docs",
                     version="v1", bucket="DAY")

    def cycle(label: str) -> None:
        feed, token = consume_changes(spark, root, "docs", ckpt)
        n = feed.groupBy("_change_type").agg(
            F.sum("_n").alias("rows")).collect()
        print(f"{label}: " + (", ".join(
            f"{r['_change_type']}={r['rows']}" for r in n) or "no changes"))
        # "process" = print; a real consumer writes features keyed by
        # doc_id so at-least-once redelivery is idempotent
        commit_consumed(ckpt, token)

    cycle("run 1 (baseline: full snapshot)")      # 12 inserts
    cycle("run 2 (nothing changed)")              # empty

    update_where(spark, root, "docs",
                 {"type": "selector", "dimension": "lang", "value": "de"},
                 set={"score": "score * 10"})
    # 6 'de' rows matched, but the h=0 rows carry score 0.0 — a no-op
    # assignment the logical netting cancels: 3 deletes + 3 inserts
    cycle("run 3 (after UPDATE de)")

    delete_where(spark, root, "docs",
                 {"type": "bound", "dimension": "doc_id", "lower": "300",
                  "ordering": "numeric"})
    cycle("run 4 (after DELETE day 3)")           # 4 deletes

    # physical rewrite with identical rows: the feed stays EMPTY
    compact_segments(spark, root, "docs", "2024-01-01/2024-02-01",
                     bucket="MONTH")
    cycle("run 5 (after compaction)")             # no changes

    # --- a SECOND consumer in physical mode (round 13): a replicator /
    # cache invalidator tracks FILES, not net rows, so rewrites must NOT
    # cancel for it. Same checkpoint machinery, mode="physical": every
    # run delivers whole changed buckets, both sides, _n = 1. Distinct
    # registered checkpoint — each consumer owns its own lag, and both
    # are visible to list_consumers / floored by maintain_table.
    pckpt = consumer_checkpoint_path(root, "docs", "replica_sync")
    feed, token = consume_changes(spark, root, "docs", pckpt,
                                  mode="physical")
    commit_consumed(pckpt, token)  # baseline: current view as inserts
    update_where(spark, root, "docs",
                 {"type": "selector", "dimension": "lang", "value": "en"},
                 set={"score": "score + 1"})
    feed, token = consume_changes(spark, root, "docs", pckpt,
                                  mode="physical")
    sides = {r["_change_type"]: r["rows"] for r in
             feed.groupBy("_change_type").agg(
                 F.sum("_n").alias("rows")).collect()}
    # the update rewrote the (compacted) month bucket: the replica drops
    # the whole old file set and copies the whole new one — deletes ==
    # the bucket's previous rows, inserts == its current rows
    print(f"replica sync (physical): {sides}")
    commit_consumed(pckpt, token)

    spark.stop()


if __name__ == "__main__":
    main()
