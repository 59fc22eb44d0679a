"""Batch ingestion: publish a raw event DataFrame as a managed segment
table (the engine-side equivalent of Druid's batch indexing, which the
reference reads the output of).

One Spark pass: bucket the rows by time (`DAY` etc.), hash-repartition by
bucket so each bucket's files are written together, write everything under
a single staging tree partitioned by bucket, then register one manifest
per bucket. At 100 TB this is the standard layout job — no driver-side
data movement, one shuffle on the bucket key, file sizes controlled by
``files_per_bucket``.
"""

from __future__ import annotations

import os
import shutil
import urllib.parse
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.functions.granularity import granularity_expr
from druid_hadoop_utils_spark.intervals import Interval
from druid_hadoop_utils_spark.sources.segments import (
    SegmentManifest,
    register_manifest,
    segment_dir,
)

_BUCKET_DELTAS = {
    "HOUR": timedelta(hours=1),
    "DAY": timedelta(days=1),
    "MONTH": None,  # calendar month: computed per bucket
}


def _bucket_end(start: datetime, bucket: str) -> datetime:
    if bucket == "MONTH":
        if start.month == 12:
            return start.replace(year=start.year + 1, month=1)
        return start.replace(month=start.month + 1)
    return start + _BUCKET_DELTAS[bucket]


def publish_segments(
    df: DataFrame,
    table_root: str,
    data_source: str,
    version: str,
    time_column: str = "__time",
    bucket: str = "DAY",
    files_per_bucket: int = 1,
    sort_by: list[str] | None = None,
) -> list[SegmentManifest]:
    """Publish ``df`` as one segment per time bucket at ``version``.

    The whole input is written in ONE job (repartitioned on the bucket key,
    written with ``partitionBy``); manifests are registered afterwards from
    the directory listing, newest-version-wins visibility applying only
    once the manifest lands (crash-safe: orphan parquet without a manifest
    is invisible).
    """
    if bucket not in {"HOUR", "DAY", "MONTH"}:
        raise ValueError(f"unsupported ingest bucket: {bucket!r} (HOUR/DAY/MONTH)")

    if time_column != "__time":
        df = df.withColumnRenamed(time_column, "__time")
    # salt bounds output files at files_per_bucket per bucket: each
    # (bucket, salt) pair lands in one shuffle partition, so partitionBy
    # emits at most files_per_bucket files per bucket dir
    bucketed = (
        df.withColumn("__bucket", granularity_expr(bucket, F.col("__time")))
        .withColumn("__salt", F.pmod(F.xxhash64(F.col("__time")), F.lit(files_per_bucket)))
        .repartition(F.col("__bucket"), F.col("__salt"))
        .drop("__salt")
    )
    if sort_by:
        # clustering dims within each file tightens parquet row-group
        # min/max stats → better predicate skipping on those dims at read
        # time (the Spark-era stand-in for Druid's bitmap indexes).
        # __bucket leads the sort so the dynamic-partition writer's own
        # required ordering is already satisfied and it won't re-sort.
        bucketed = bucketed.sortWithinPartitions("__bucket", *sort_by)

    staging = os.path.join(table_root, data_source, f"_staging_{version}")
    bucketed.write.mode("overwrite").partitionBy("__bucket").parquet(staging)

    # promote each staged bucket dir to its segment location (a rename, no
    # second write) and announce it; manifests land last (crash-safe)
    manifests: list[SegmentManifest] = []
    for name in sorted(os.listdir(staging)):
        if not name.startswith("__bucket="):
            continue
        raw = urllib.parse.unquote(name.split("=", 1)[1])
        start = datetime.fromisoformat(raw).replace(tzinfo=timezone.utc)
        iv = Interval(start, _bucket_end(start, bucket))
        seg_dir = segment_dir(table_root, data_source, iv, version)
        os.makedirs(os.path.dirname(seg_dir), exist_ok=True)
        os.replace(os.path.join(staging, name), seg_dir)
        manifest = SegmentManifest(data_source, iv, str(version), 0, seg_dir)
        register_manifest(table_root, manifest)
        manifests.append(manifest)
    shutil.rmtree(staging, ignore_errors=True)  # only _SUCCESS remains
    return manifests
