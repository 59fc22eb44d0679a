"""The whole maintenance story in one cron call — maintain_table.

An operator of a 100 TB managed table schedules exactly ONE thing per
table: ``maintain_table(spark, root, ds)``. It sequences the five
sweeps the engine otherwise exposes piecemeal, in the order their
invariants require:

1. advisor compaction (small/many-file segments rewritten),
2. vacuum — with retention FLOORED at the oldest registered consumer
   checkpoint, so an incremental consumer that fell behind never loses
   the view its next ``consume_changes`` diffs from,
3. materialized catch-up (DML/publish/compaction pending markers →
   exactly the affected segments recompute),
4. postings re-compaction (named by the now-settled timeline version),
5. age-gated materialized vacuum (stale states and compact trees).

Run: python examples/table_maintenance.py
"""

from __future__ import annotations

import os
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row, functions as F

import druid_hadoop_utils_spark as eng
from druid_hadoop_utils_spark.session import get_spark


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("table-maintenance-example")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="maint_example_")

    rows = [Row(__time=datetime(2024, 1, d, h), doc_id=d * 100 + h,
                kind="err" if h == 3 else "ok", score=float(h))
            for d in (1, 2) for h in range(6)]
    eng.publish_segments(spark.createDataFrame(rows), root, "docs",
                         version="v1", bucket="DAY",
                         published_at="2024-06-01T00:00:00+00:00")

    # a registered consumer baselines and commits — its checkpoint is
    # now a standing retention floor maintenance respects automatically
    ckpt = eng.consumer_checkpoint_path(root, "docs", "feature_builder")
    feed, token = eng.consume_changes(spark, root, "docs", ckpt)
    print(f"consumer baseline: {feed.count()} rows")
    eng.commit_consumed(ckpt, token)

    # DML lands; the consumer has NOT caught up yet
    eng.delete_where(spark, root, "docs",
                     {"type": "selector", "dimension": "kind",
                      "value": "err"})

    rep = eng.maintain_table(spark, root, "docs")
    print(f"maintenance 1: floor={rep['consumer_floor_as_of']} "
          f"vacuumed={len(rep['vacuumed'])} (lagging consumer protects "
          "the pre-delete view)")
    for name, lag in eng.list_consumers(root, "docs").items():
        print(f"  consumer {name}: {lag['pending_announces']} pending, "
              f"{lag['behind_s']:.0f}s behind")

    # the consumer catches up; the floor advances to its new checkpoint
    # and the next maintenance reclaims the pre-delete history
    feed, token = eng.consume_changes(spark, root, "docs", ckpt)
    print(f"consumer catch-up: "
          + ", ".join(f"{r['_change_type']}={r['n']}" for r in
                      feed.groupBy("_change_type")
                      .agg(F.sum("_n").alias("n")).collect()))
    eng.commit_consumed(ckpt, token)

    rep = eng.maintain_table(spark, root, "docs")
    print(f"maintenance 2: floor={rep['consumer_floor_as_of']} "
          f"vacuumed={len(rep['vacuumed'])} (floor released)")

    spark.stop()


if __name__ == "__main__":
    main()
