"""SparkSession factory with the engine's required configuration.

The reference pins UTC + en_US for determinism (reference: pom.xml:36-39);
Druid intervals/timestamps are UTC ISO-8601, so the engine requires
``spark.sql.session.timeZone=UTC``.

``spark.sql.legacy.parquet.nanosAsLong=true`` is needed because the driver's
synthetic testdata writes parquet TIMESTAMP(NANOS) columns, which Spark
otherwise refuses to read; ``sources.tables`` converts those long-nanos
columns back to proper TimestampType.

Scale posture (100 TB / 1000-executor target, tested on local mode):
AQE on (runtime coalescing + skew-join splitting), adaptive shuffle
partition sizing, and Arrow enabled for the few pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "druid-hadoop-utils-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()
