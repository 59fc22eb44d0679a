"""``load(spark, ...) -> DataFrame`` — the engine's query planner.

The Spark-native equivalent of the reference's full read path (SURVEY.md §3):
overlord metadata fetch → versioned timeline → splits → segment read with
filter/granularity applied → host-engine relational ops. Here that becomes:

    manifest listing (driver-side)                 [replaces S1 HTTP hop]
    → overshadow-resolved file set                 [S2 timeline]
    → spark.read.parquet(paths)                    [S3 segment reader]
    → .where(interval ∧ DimFilter)                 [P2 + P3, pushed down]
    → .select(__time, dims, metrics)               [P1 column pruning]
    → granularity truncation                       [G1]
    → optional rollup groupBy().agg(...)           [A-rows]

Everything is declarative DataFrame construction — Catalyst does predicate
pushdown, column pruning and partition planning; no custom rules
(SURVEY.md §4 conclusion).

Scale notes: the fast path produces ONE parquet scan over the visible files
(no unions, no repartition); window-filtered unions only appear under
partial overshadow, which is rare and still one scan per distinct window
set. Rollup is a single hash-aggregate shuffle on (time bucket, dims) with
map-side partial aggregation, including sketch partials.
"""

from __future__ import annotations

import os
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from druid_hadoop_utils_spark.intervals import Interval, parse_intervals
from druid_hadoop_utils_spark.plans.spec import LoadSpec
from druid_hadoop_utils_spark.functions.filters import filter_to_column
from druid_hadoop_utils_spark.functions.granularity import granularity_expr
from druid_hadoop_utils_spark.sources.segments import (
    MANIFEST_DIR,
    list_manifests,
    resolve_visible_windows,
)

TIME_COL = "__time"


class AllSegmentsPruned(FileNotFoundError):
    """Every visible data segment was excluded by manifest column stats —
    the query result is provably empty (distinct from 'no segments')."""


def _interval_pred(iv: Interval, col, ntz: bool = False):
    lo = F.lit(iv.start.replace(tzinfo=None))
    hi = F.lit(iv.end.replace(tzinfo=None))
    if ntz:
        lo, hi = lo.cast("timestamp_ntz"), hi.cast("timestamp_ntz")
    return (col >= lo) & (col < hi)


def _scan_segments(spark: SparkSession, table_root: str, data_source: str,
                   iv: Interval, dim_filter: dict | None = None,
                   as_of=None, manifests=None) -> DataFrame:
    """Manifest → overshadow resolution → minimal parquet scan(s).

    ``dim_filter`` (the spec's DimFilter JSON) additionally drops visible
    segments whose manifest column stats provably exclude the filter
    (plans/pruning.py) — Druid-style segment skipping on dimensions, on
    top of the timeline's interval pruning.

    ``manifests`` lets a caller that already listed this (root,
    datasource, as_of) reuse its listing — one metadata round-trip per
    plan instead of two (clone_view)."""
    from druid_hadoop_utils_spark.plans.pruning import (
        filter_constraints,
        segment_excluded,
    )

    if manifests is None:
        manifests = list_manifests(table_root, data_source, as_of=as_of)
    visible = resolve_visible_windows(manifests, iv)
    if not visible:
        raise FileNotFoundError(
            f"no visible segments for {data_source} in {iv.iso()}"
        )
    constraints = filter_constraints(dim_filter)
    full_paths: list[str] = []
    windowed: dict[tuple[Interval, ...], list[str]] = defaultdict(list)
    had_data = False
    for w in visible:
        if w.manifest.tombstone:
            # holds the timeline slot (hiding older versions) but has no
            # data to scan — Druid drop/kill semantics
            continue
        had_data = True
        if segment_excluded(w.manifest.stats, constraints):
            continue
        if w.is_fully_visible(iv):
            full_paths.append(w.manifest.path)
        else:
            windowed[w.windows].append(w.manifest.path)
    if not full_paths and not windowed:
        if had_data:
            # every data segment was stats-pruned: the query provably
            # matches nothing — load() returns the correctly-shaped empty
            # frame (an EMPTY RESULT, not a missing-segments error, so it
            # bypasses ignore_when_no_segments)
            raise AllSegmentsPruned(
                f"all visible segments of {data_source} in {iv.iso()} "
                "pruned by manifest column stats"
            )
        raise FileNotFoundError(
            f"no visible segments for {data_source} in {iv.iso()} "
            "(interval fully dropped)"
        )

    # mergeSchema: Druid dimensions evolve — a column added in a newer
    # segment version must read as NULL in older segments, not pick
    # whichever file's footer Spark sampled first. The merge is a
    # driver-side footer union (metadata only); pushdown and pruning are
    # unaffected. A column whose TYPE changes across versions fails the
    # merge loudly (Spark CANNOT_MERGE_SCHEMAS) — the Druid analogue of
    # a metric type change, which requires reindexing (compact the old
    # intervals with the new type to migrate).
    def read(paths: list[str]) -> DataFrame:
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    parts: list[DataFrame] = []
    if full_paths:
        parts.append(read(full_paths))
    for windows, paths in windowed.items():
        df = read(paths)
        pred = _interval_pred(windows[0], F.col(TIME_COL))
        for win in windows[1:]:
            pred = pred | _interval_pred(win, F.col(TIME_COL))
        parts.append(df.where(pred))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def load(
    spark: SparkSession,
    source: str | DataFrame,
    spec: LoadSpec | dict | str,
    interval: str | Interval | list | None = None,
    data_source: str | None = None,
    rollup: bool = False,
    time_column: str = TIME_COL,
    ignore_when_no_segments: bool = True,
    as_of=None,
) -> DataFrame:
    """Load a datasource through a LoadSpec, Druid-connector style.

    ``source`` is a managed table root (a directory with
    ``<dataSource>/_segments/``), a plain parquet path, or an existing
    DataFrame. ``time_column`` names the event-time column in the input; it
    is exposed as ``__time`` (the reference emits the timestamp first in
    every tuple — DruidStorage.java:122).

    Matching reference behavior, granularity only TRUNCATES at read time;
    it does not merge rows (SURVEY.md §7.4) — pass ``rollup=True`` to also
    re-aggregate by (bucket, dims) with metric-type-aware merges.

    ``as_of`` (or the spec's ``"asOf"`` JSON field) time-travels a
    managed-table source: the timeline resolves over only the manifests
    announced at or before that instant, reproducing the table exactly
    as a reader then saw it (bounded by the last physical vacuum —
    ``sources.segments.list_manifests``).
    """
    if not isinstance(spec, LoadSpec):
        spec = LoadSpec.from_json(spec, data_source=data_source, interval=interval)
    if as_of is not None:
        # explicit arg wins over the spec's "asOf" JSON field
        import dataclasses as _dc

        spec = _dc.replace(spec, as_of=as_of)
    ivs = parse_intervals(interval) if interval is not None else spec.intervals

    if isinstance(source, DataFrame):
        df = source
    else:
        ds = data_source or spec.data_source
        from druid_hadoop_utils_spark.sources.fs import get_fs

        _fs = get_fs(source)
        if ds and _fs.isdir(_fs.join(source, ds, MANIFEST_DIR)):
            if not ivs:
                raise ValueError("an interval is required for segment-table loads")
            try:
                # one scan over the SPAN of the condensed intervals: the
                # timeline resolution is pointwise in time, so restricting
                # the span's visible set by the per-interval predicates
                # below equals resolving each interval separately
                span = Interval(ivs[0].start, ivs[-1].end)
                df = _scan_segments(spark, source, ds, span,
                                    dim_filter=spec.filter,
                                    as_of=spec.as_of)
            except AllSegmentsPruned:
                # a provably-empty result, not missing data
                return _empty_result(spark, spec)
            except FileNotFoundError:
                if not ignore_when_no_segments:
                    raise
                # reference parity: ignoreWhenNoSegments=true returns no
                # rows instead of failing (PigSegmentLoadSpec.java:64-81)
                return _empty_result(spark, spec)
        else:
            df = spark.read.parquet(source)

    if time_column != TIME_COL:
        df = df.withColumnRenamed(time_column, TIME_COL)

    time_type = dict(df.dtypes).get(TIME_COL)
    time_is_nanos = time_type == "bigint"
    time_is_ntz = time_type == "timestamp_ntz"
    if ivs:
        if time_is_nanos:
            # epoch-nanos long time column: compare raw longs so the range
            # predicate pushes down to parquet row-group stats (a predicate
            # over timestamp_micros(col) would not push)
            from datetime import datetime, timedelta, timezone

            epoch = datetime(1970, 1, 1, tzinfo=timezone.utc)
            us = timedelta(microseconds=1)
            lmin, lmax = -(1 << 63), (1 << 63) - 1

            def nanos_pred(iv: Interval):
                # clamp to int64: nanos can only represent ~1677..2262, so
                # a wider interval (e.g. /3000-01-01) means "no bound"
                start_ns = max(((iv.start - epoch) // us) * 1000, lmin)
                end_ns = min(((iv.end - epoch) // us) * 1000, lmax)
                return (F.col(TIME_COL) >= F.lit(start_ns)) & (
                    F.col(TIME_COL) < F.lit(end_ns)
                )

            pred = nanos_pred(ivs[0])
            for iv in ivs[1:]:
                pred = pred | nanos_pred(iv)
        else:
            # TIMESTAMP_NTZ columns compare against NTZ literals so the
            # range predicate pushes down to the parquet scan unwrapped
            # (an LTZ literal would coerce the column and block pushdown)
            pred = _interval_pred(ivs[0], F.col(TIME_COL), ntz=time_is_ntz)
            for iv in ivs[1:]:
                pred = pred | _interval_pred(iv, F.col(TIME_COL), ntz=time_is_ntz)
        df = df.where(pred)
    if time_is_nanos:
        df = df.withColumn(TIME_COL, F.timestamp_micros(F.expr(f"`{TIME_COL}` DIV 1000")))
    elif time_is_ntz:
        # session tz is pinned UTC (session.py), so NTZ → LTZ preserves the
        # instant; downstream granularity/filter/agg code sees one time type
        df = df.withColumn(TIME_COL, F.col(TIME_COL).cast("timestamp"))
    if spec.filter is not None:
        df = df.where(filter_to_column(spec.filter, df.schema))

    df = df.withColumn(TIME_COL, granularity_expr(spec.granularity, F.col(TIME_COL)))

    cols = [TIME_COL] + [c for c in spec.dimensions + spec.metric_names if c in df.columns]
    missing = [c for c in spec.dimensions + spec.metric_names if c not in df.columns]
    if missing:
        raise ValueError(f"spec columns not in source: {missing}")
    df = df.select(*cols)

    if rollup:
        df = rollup_df(df, spec)
    return df


def _empty_result(spark: SparkSession, spec: LoadSpec) -> DataFrame:
    """Zero-row DataFrame with the spec's declared schema (timestamp,
    string-array dims, typed metrics) — what the reference's
    ignoreWhenNoSegments path produces."""
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    fields = [StructField(TIME_COL, TimestampType())]
    fields += [StructField(d, ArrayType(StringType())) for d in spec.dimensions]
    for m in spec.metrics:
        if m.is_complex:
            t = BinaryType()
        elif m.type == "long":
            t = LongType()
        elif m.type in {"float", "double"}:
            t = DoubleType()
        else:
            t = StringType()
        fields.append(StructField(m.name, t))
    return spark.createDataFrame([], StructType(fields))


def to_compat_output(df: DataFrame) -> DataFrame:
    """Reference-compatible output shape: ``druid_timestamp`` as an
    ISO-8601 string in the first position (reference: DruidStorage.java:122
    emits ``row.getTimestamp().toString()``, schema field name at :231).
    Only for the compatibility edge — keep TimestampType internally."""
    others = [c for c in df.columns if c != TIME_COL]
    return df.select(
        F.date_format(F.col(TIME_COL), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias(
            "druid_timestamp"
        ),
        *others,
    )


def rollup_df(df: DataFrame, spec: LoadSpec, explode_dims: bool = False) -> DataFrame:
    """Merge rows sharing (time bucket, dims) with metric-type-aware
    aggregation: additive metrics sum; complex (sketch) metrics merge into
    non-finalized binary state so the result stays re-aggregable — the
    NonFinalizing semantics of the reference (SURVEY.md §2.5 A3).

    ``explode_dims=True`` applies Druid's multi-value groupBy semantics
    (each value of a multi-value dimension forms its own group).
    """
    from druid_hadoop_utils_spark.functions.aggregators import _hll_partial, DEFAULT_LGK
    from pyspark.sql.types import BinaryType

    dims = list(spec.dimensions)
    if explode_dims:
        for d in dims:
            if isinstance(df.schema[d].dataType, ArrayType):
                df = df.withColumn(d, F.explode_outer(d))

    aggs = []
    for m in spec.metrics:
        col = F.col(m.name)
        if m.type == "qhist":
            # mergeable histogram-quantile state (functions/quantiles):
            # element-wise re-merge keeps the metric re-aggregable
            from druid_hadoop_utils_spark.functions.quantiles import (
                DEFAULT_BINS,
                qhist_merge,
            )

            aggs.append(qhist_merge(col, DEFAULT_BINS).alias(m.name))
        elif m.type == "druidHyperUnique":
            # imported Druid-format sketch bytes (NOT DataSketches): merge
            # register-wise into NEW Druid bytes so the rolled-up metric
            # stays re-mergeable in Druid's own format (reference A3,
            # NonFinalizingAggregatorFactoryAdapter.java:19-31)
            from druid_hadoop_utils_spark.sources.druid_segment import (
                druid_hll_merge,
            )

            aggs.append(druid_hll_merge(F.collect_list(col)).alias(m.name))
        elif m.is_complex:
            is_sketch = isinstance(df.schema[m.name].dataType, BinaryType)
            aggs.append(_hll_partial(col, is_sketch, DEFAULT_LGK).alias(m.name))
        elif m.type == "long":
            aggs.append(F.sum(col).cast("long").alias(m.name))
        elif m.type in {"float", "double"}:
            aggs.append(F.sum(col.cast("double")).alias(m.name))
        else:  # string passthrough metrics keep the first value
            aggs.append(F.first(col, ignorenulls=True).alias(m.name))
    return df.groupBy(TIME_COL, *dims).agg(*aggs)
