"""The incremental consumer as ONE Structured Streaming query.

Where examples/incremental_consumer.py drives the batch poll loop
(consume_changes → process → commit_consumed) by hand, this wires the
same change feed into Spark's streaming engine via the
``segment_announces`` Python streaming data source
(streaming/changes_source.py): a micro-batch fires per committed
publish-stamp advance, each batch hands the processor the ROW-LEVEL
feed for its exact (from, to] stamp pair, Spark's own checkpoint
carries the offset across restarts, and the named stream advances its
REGISTERED consumer checkpoint so maintain_table's vacuum floor
protects it while it lags.

Run: python examples/streaming_consumer.py
"""

from __future__ import annotations

import os
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row, functions as F

from druid_hadoop_utils_spark.session import get_spark
from druid_hadoop_utils_spark.sources.changes import list_consumers
from druid_hadoop_utils_spark.sources.dml import update_where
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.streaming.changes_source import (
    stream_changes_foreach,
)

T1 = "2024-06-01T00:00:00+00:00"


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("streaming-consumer-example")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stream_chg_")

    rows = [Row(__time=datetime(2024, 1, 1 + d, h), doc_id=d * 100 + h,
                lang="en" if h % 2 else "de", score=float(h))
            for d in range(3) for h in range(4)]
    publish_segments(spark.createDataFrame(rows), root, "docs",
                     version="v1", bucket="DAY", published_at=T1)

    def process(feed, a, b):
        sides = {r["_change_type"]: int(r["rows"]) for r in
                 feed.groupBy("_change_type").agg(
                     F.sum("_n").alias("rows")).collect()}
        print(f"batch ({a} -> {b}]: {sides or 'no changes'}")

    def drain() -> None:
        q = stream_changes_foreach(
            spark, root, "docs", process,
            checkpoint_dir=os.path.join(root, "_stream_ckpt"),
            consumer_name="stream_features", available_now=True)
        q.awaitTermination(120)

    drain()   # batch 1: the GENESIS full snapshot as inserts

    update_where(spark, root, "docs",
                 {"type": "selector", "dimension": "lang", "value": "de"},
                 set={"score": "score * 10"})
    drain()   # batch 2: only the update's net row changes

    drain()   # caught up: no batch fires

    lag = list_consumers(root, "docs")["stream_features"]
    print(f"registered stream consumer: consumed_as_of="
          f"{lag['consumed_as_of']} behind_s={lag['behind_s']}")
    spark.stop()


if __name__ == "__main__":
    main()
