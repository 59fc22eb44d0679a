"""DML cost locality (VERDICT r10 item 8, carried from r8).

The 100 TB property under test: a merge touching one hot day costs one
day's rewrite — untouched buckets' segment files are never rewritten,
moved, or even opened for write (byte-identical on disk), and the only
new bytes land under the affected bucket's fresh version. Plus the
composition the streaming story implies: DML on a streamed HOUR-bucket
table, with time travel still resolving the pre-merge view.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark import load
from druid_hadoop_utils_spark.sources.dml import merge_into
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.segments import (
    list_manifests,
    max_published_stamp,
)


def _file_hashes(root: str) -> dict[str, str]:
    """sha256 of every data file under the table root (manifests and
    lease files excluded — they are metadata and may legitimately
    change)."""
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        if "_segments" in dirpath:
            continue
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[p] = hashlib.sha256(fh.read()).hexdigest()
    return out


def test_merge_rewrites_only_affected_day(spark, tmp_path):
    root = str(tmp_path / "tbl")
    rows = [Row(ts=datetime(2024, 1, 1 + d, h), k=f"k{h}",
                v=float(d * 10 + h)) for d in range(5) for h in (1, 2, 3)]
    publish_segments(spark.createDataFrame(rows), root, "t", version="v1",
                     time_column="ts", bucket="DAY")
    before = _file_hashes(root)
    assert before, "no data files published"

    merge_into(spark, root, "t",
               spark.createDataFrame(
                   [Row(__time=datetime(2024, 1, 3, 1), k="k1", v=777.0)]),
               ["k"])

    after = _file_hashes(root)
    # every pre-existing byte is untouched: the overshadowed old day-3
    # segment included (readers in flight keep their snapshot)
    for p, h in before.items():
        assert p in after and after[p] == h, f"pre-existing file changed: {p}"
    # the only NEW bytes are the affected day's fresh version
    added = sorted(set(after) - set(before))
    assert added, "merge wrote nothing"
    assert all("2024-01-03" in p for p in added), added
    # and the timeline agrees: exactly one new version, day-3 only
    new = [m for m in list_manifests(root, "t") if m.version != "v1"]
    assert {m.interval.start.day for m in new} == {3}
    assert len({m.version for m in new}) == 1


def test_streamed_hour_table_merge_composes_with_time_travel(
        spark, tmp_path):
    from druid_hadoop_utils_spark.streaming.ingest import (
        segment_publishing_writer,
        streaming_rollup,
    )

    src = str(tmp_path / "stream_in")
    first = spark.createDataFrame(
        [Row(ts=datetime(2024, 1, 1, h, m), event_type=t, value=float(v))
         for h, m, t, v in [(0, 5, "a", 1), (0, 25, "a", 2), (0, 45, "b", 3),
                            (1, 10, "a", 4), (1, 20, "b", 5),
                            (5, 0, "sentinel", 9)]])
    first.coalesce(1).write.parquet(src + "/c0")
    root = str(tmp_path / "tables")

    stream = spark.readStream.schema(first.schema) \
        .option("maxFilesPerTrigger", 1).parquet(src + "/*")
    rolled = streaming_rollup(
        stream, dims=["event_type"],
        aggs=[F.sum("value").alias("value"), F.count("*").alias("n")])
    q = segment_publishing_writer(
        rolled, root, "sev", checkpoint_dir=str(tmp_path / "ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    spec = {"granularity": "NONE", "dimensions": ["event_type"],
            "metrics": [{"name": "value", "type": "double"},
                        {"name": "n", "type": "long"}]}

    def rows(as_of=None):
        df = load(spark, root, spec, interval="2024-01-01/2024-01-02",
                  data_source="sev", as_of=as_of)
        return {(r["__time"].isoformat(), r["event_type"]):
                (r["value"], r["n"]) for r in df.collect()}

    pre = rows()
    assert pre[("2024-01-01T00:00:00", "a")] == (3.0, 2)
    pre_stamp = max_published_stamp(root, "sev")

    # row-level DML on the streamed table: fix hour-0 'a' to value 100
    merge_into(spark, root, "sev",
               spark.createDataFrame(
                   [Row(__time=datetime(2024, 1, 1, 0), event_type="a",
                        value=100.0, n=2)]),
               ["event_type"], bucket="HOUR")

    cur = rows()
    assert cur[("2024-01-01T00:00:00", "a")] == (100.0, 2)
    # untouched hour and untouched key unchanged
    assert cur[("2024-01-01T00:00:00", "b")] == pre[
        ("2024-01-01T00:00:00", "b")]
    assert cur[("2024-01-01T01:00:00", "a")] == pre[
        ("2024-01-01T01:00:00", "a")]
    # time travel composes: the pre-merge view still resolves exactly
    assert rows(as_of=pre_stamp) == pre
    # and only the affected HOUR bucket carries a new version
    batch_versions = {m.version for m in list_manifests(root, "sev")
                      if m.version.startswith("batch-")}
    new = [m for m in list_manifests(root, "sev")
           if m.version not in batch_versions]
    assert {(m.interval.start.hour, m.interval.end.hour) for m in new} \
        == {(0, 1)}
