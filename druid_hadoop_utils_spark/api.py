"""Druid-query-shaped convenience API over the engine primitives.

The reference exposes rows to a host engine (Pig/MR) where users hand-write
grouping and aggregation (reference: druid_exporter.pig:6-17). Druid itself
serves three canonical query shapes over the same data — ``timeseries``,
``topN``, ``groupBy`` — so a reference user migrating here gets them as
one-call DataFrame builders. Each is: engine ``load()`` (pruned scan +
filter + granularity) → ``group_aggregate`` (two-phase aggs + post-aggs) →
shape-specific ordering/limit. All Catalyst; a topN plans as partial
top-k per partition (TakeOrderedAndProject), not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.functions.aggregators import group_aggregate
from druid_hadoop_utils_spark.plans.planner import load
from druid_hadoop_utils_spark.plans.spec import LoadSpec


def _base(
    spark: SparkSession,
    source,
    spec: LoadSpec | dict | str,
    interval,
    data_source: str | None,
    time_column: str,
) -> tuple[DataFrame, LoadSpec]:
    if not isinstance(spec, LoadSpec):
        spec = LoadSpec.from_json(spec, data_source=data_source, interval=interval)
    df = load(spark, source, spec, interval=interval, data_source=data_source,
              time_column=time_column)
    return df, spec


def timeseries(
    spark: SparkSession,
    source,
    spec: LoadSpec | dict | str,
    aggregations: list[dict],
    post_aggregations: list[dict] | None = None,
    interval=None,
    data_source: str | None = None,
    time_column: str = "__time",
) -> DataFrame:
    """Druid ``timeseries``: one row per granularity bucket, ordered by
    time. Dimensions in the spec are ignored for grouping (per Druid)."""
    df, _ = _base(spark, source, spec, interval, data_source, time_column)
    out = group_aggregate(df, [], aggregations, post_aggregations)
    return out.orderBy("__time")


def topn(
    spark: SparkSession,
    source,
    spec: LoadSpec | dict | str,
    dimension: str,
    metric: str,
    threshold: int,
    aggregations: list[dict],
    post_aggregations: list[dict] | None = None,
    interval=None,
    data_source: str | None = None,
    time_column: str = "__time",
) -> DataFrame:
    """Druid ``topN``: leaderboard of ``dimension`` values by ``metric``
    within each granularity bucket (ties broken by dimension value for
    determinism)."""
    from pyspark.sql import Window

    df, _ = _base(spark, source, spec, interval, data_source, time_column)
    out = group_aggregate(df, [dimension], aggregations, post_aggregations)
    w = Window.partitionBy("__time").orderBy(F.desc(metric), F.col(dimension))
    return (
        out.withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= threshold)
        .drop("__rank")
        .orderBy("__time", F.desc(metric), F.col(dimension))
    )


def groupby(
    spark: SparkSession,
    source,
    spec: LoadSpec | dict | str,
    dimensions: list[str] | None,
    aggregations: list[dict],
    post_aggregations: list[dict] | None = None,
    interval=None,
    data_source: str | None = None,
    time_column: str = "__time",
    explode_multivalue: bool = True,
) -> DataFrame:
    """Druid ``groupBy``: group on (bucket, dims). Multi-value dimensions
    explode so each value groups separately (Druid semantics,
    SURVEY.md §7.4), unless ``explode_multivalue=False``."""
    from pyspark.sql.types import ArrayType

    df, spec_obj = _base(spark, source, spec, interval, data_source, time_column)
    dims = dimensions if dimensions is not None else spec_obj.dimensions
    if explode_multivalue:
        for d in dims:
            if isinstance(df.schema[d].dataType, ArrayType):
                df = df.withColumn(d, F.explode_outer(d))
    return group_aggregate(df, dims, aggregations, post_aggregations)
