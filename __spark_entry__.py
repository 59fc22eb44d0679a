"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``druid_hadoop_utils_spark``; this module is the thin
driver-facing adapter. ``queries()`` covers the SURVEY.md §2 inventory
(scans/filters/granularities/aggregations/post-aggs through the engine's
LoadSpec path, HOST relational ops in plain Spark) plus the
training-pipeline extensions (dedup/similarity/text); ``oracle_sql()``
provides the DuckDB twin for every SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from druid_hadoop_utils_spark import battery


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return battery.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return battery.queries()


def oracle_sql() -> dict[str, str]:
    return battery.oracle_sql()
