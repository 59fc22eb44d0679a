"""Read the driver-provided synthetic parquet tables (TESTDATA.md).

The driver generates TIMESTAMP(NANOS) parquet columns which Spark only reads
with ``spark.sql.legacy.parquet.nanosAsLong=true`` (as LongType nanos). This
loader sets that conf at runtime, inspects the parquet footer with pyarrow to
find which columns are nanosecond timestamps, and casts them back to proper
``TimestampType`` (truncating to microseconds — Spark's native precision,
matching what DuckDB returns for the same files).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)
ALL_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")


def _nanos_timestamp_columns(path: str) -> list[str]:
    """Columns stored as parquet timestamp[ns], via the footer schema."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    files = [path]
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.parquet"))) or [path]
    schema = pq.read_schema(files[0])
    out = []
    for field in schema:
        if pat.is_timestamp(field.type) and field.type.unit == "ns":
            out.append(field.name)
    return out


def load_table(
    spark: SparkSession, sf_dir: str, name: str, convert_nanos: bool = True
) -> DataFrame:
    """Load ``<sf_dir>/<name>.parquet`` with nanos-timestamp repair.

    ``convert_nanos=False`` keeps TIMESTAMP(NANOS) columns as raw epoch-nanos
    longs — the engine's ``load()`` recognizes a LongType time column as
    epoch nanos and pushes interval predicates down to the parquet scan as
    long-range bounds (an expression over the converted timestamp would not
    push, forfeiting row-group skipping — fatal at 100 TB)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamp[us] columns (isAdjustedToUTC=false) must read as session-tz
    # TimestampType, not TIMESTAMP_NTZ: the session is pinned UTC so the
    # values are identical, engine literals/predicates stay pushdown-able,
    # and output matches the DuckDB oracle's naive timestamps.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(path)
    if convert_nanos:
        for col in _nanos_timestamp_columns(path):
            # long nanos → microseconds → TimestampType. Integer division
            # (DIV) is required: double division loses precision above 2^53
            # ns and would shift microsecond values.
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=ALL_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}
