"""Per-segment aggregate-state materialization — incremental rollup
maintenance for managed segment tables.

Druid rolls up at INGESTION time (the reference's segments carry
pre-aggregated metrics — note:1-5, sample-schema.json:4-7); this module
is the lazy Spark-first equivalent: rollup states are computed PER
SEGMENT, on demand, into small parquet files beside the table
(`<root>/<ds>/_materialized/<name>/`), and a query over the rollup
merges the per-segment states instead of rescanning raw rows.

Why this is the shape you want at 100 TB:

- **Incremental**: `materialize_aggs` skips every segment that already
  has a state file — a new day's publish costs one segment's scan, never
  a table rescan. The segment IDENTIFIER keys the state file, so
  overshadowed versions' states are simply never read again (and
  `vacuum_materialized` reclaims them).
- **Mergeable states only**: sums/counts/min/max re-aggregate exactly;
  hyperUnique/thetaSketch states union losslessly (the reference's
  NonFinalizing → merge → Finalizing chain, DruidStorage.java:142-151,
  AggregatorFactoryAdapter lineage). Aggregators whose states do NOT
  merge associatively (first/last, quantile sketches in this grammar)
  are rejected loudly — a silent wrong merge is the one unforgivable
  failure mode for a rollup cache.
- **Sound under MVCC**: the query path resolves the CURRENT visible
  timeline, then maps each visible segment to its state file. A segment
  that is only PARTIALLY visible (a newer version overshadows part of
  its interval) makes its whole-segment state unusable — the query
  refuses loudly (compact the table; states for the compacted segments
  then materialize cleanly) rather than over-counting.

Granularity caveat: states are bucketed by `granularity` at materialize
time; a query interval is applied to the BUCKET timestamps, so it must
align with bucket boundaries to mean what it says (same contract as
querying any rolled-up Druid datasource at coarser-than-bucket
granularity).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.intervals import Interval

#: aggregator types whose partial states re-aggregate associatively with
#: the SAME grammar (count re-merges as longSum — Druid's standard
#: count-becomes-longSum-on-rollup rule, applied automatically).
#: approxHistogram states are self-describing structs that agg_expr
#: re-merges element-wise; `filtered` is mergeable iff its inner
#: aggregator is (the filter applied at materialize time, the state
#: merging like the inner type).
MERGEABLE_TYPES = frozenset({
    "count", "longSum", "doubleSum", "longMin", "longMax",
    "doubleMin", "doubleMax", "hyperUnique", "thetaSketch",
    "approxHistogram", "approxHistogramFold",
})


def _mat_dir(table_root: str, data_source: str, name: str) -> str:
    return os.path.join(table_root, data_source, "_materialized", name)


def _state_path(mat_dir: str, identifier: str) -> str:
    from druid_hadoop_utils_spark.sources.segments import _safe

    return os.path.join(mat_dir, f"{_safe(identifier)}.parquet")


def _mergeable(a: dict) -> bool:
    t = a.get("type")
    if t == "filtered":
        inner = a.get("aggregator") or {}
        return inner.get("type") in MERGEABLE_TYPES
    return t in MERGEABLE_TYPES


def _validate_aggs(aggregations: list[dict]) -> None:
    bad = [a for a in aggregations if not _mergeable(a)]
    if bad:
        raise ValueError(
            "materialize_aggs: non-mergeable aggregator types "
            f"{sorted({a.get('type') for a in bad})} — per-segment states "
            "must re-aggregate associatively; supported: "
            f"{sorted(MERGEABLE_TYPES)} plus `filtered` wrapping any of "
            "them (first/last need time-ordered merges — query those "
            "through load()/group_aggregate on raw rows)"
        )


def _merge_aggregations(aggregations: list[dict]) -> list[dict]:
    """The query-side re-aggregation spec over state columns: count
    re-merges as longSum of the stored counts; a `filtered` wrapper
    merges as its INNER type (the filter already applied at materialize
    time); everything else keeps its type with fieldName = its own output
    name. Parameterized factories (thetaSketch size, approxHistogram
    numBuckets/probability) keep their params so the merge and the final
    quantile evaluation read the stored state correctly."""
    from druid_hadoop_utils_spark.functions.aggregators import agg_out_name

    out = []
    for a in aggregations:
        n = agg_out_name(a)
        base = a.get("aggregator") if a.get("type") == "filtered" else a
        t = "longSum" if base.get("type") == "count" else base["type"]
        merged = {k: v for k, v in base.items() if k != "filter"}
        merged.update({"type": t, "name": n, "fieldName": n})
        out.append(merged)
    return out


def materialize_aggs(
    spark: SparkSession,
    table_root: str,
    data_source: str,
    name: str,
    dimensions: list[str],
    aggregations: list[dict],
    granularity: str | dict = "DAY",
    time_column: str = "__time",
) -> list[str]:
    """Ensure every VISIBLE segment has a rollup-state file for ``name``.

    Returns the identifiers actually computed this call (already-covered
    segments are skipped — the incremental-maintenance contract). The
    spec is persisted beside the states; re-calling with a DIFFERENT
    spec under the same name is refused (pick a new name)."""
    from druid_hadoop_utils_spark.functions.aggregators import group_aggregate
    from druid_hadoop_utils_spark.functions.granularity import granularity_expr
    from druid_hadoop_utils_spark.sources.segments import (
        list_manifests,
        resolve_visible_windows,
    )

    _validate_aggs(aggregations)
    spec = {
        "dimensions": list(dimensions),
        "aggregations": aggregations,
        "granularity": granularity,
        "time_column": time_column,
    }
    mdir = _mat_dir(table_root, data_source, name)
    os.makedirs(mdir, exist_ok=True)
    spec_path = os.path.join(mdir, "spec.json")
    if os.path.exists(spec_path):
        with open(spec_path) as f:
            existing = json.load(f)
        if existing != spec:
            raise ValueError(
                f"materialized rollup {name!r} already exists with a "
                "different spec — states built under two specs must never "
                "merge; materialize under a new name"
            )
    else:
        tmp = spec_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(spec, f, indent=2)
        os.replace(tmp, spec_path)

    manifests = list_manifests(table_root, data_source)
    everything = Interval.parse("0001-01-01T00:00:00/9999-12-31T00:00:00")
    visible = resolve_visible_windows(manifests, everything)
    done: list[str] = []
    for w in visible:
        if w.manifest.tombstone:
            continue
        path = _state_path(mdir, w.manifest.identifier)
        if os.path.exists(path):
            continue
        seg = spark.read.parquet(w.manifest.path)
        bucket = granularity_expr(granularity, F.col(time_column))
        rolled = group_aggregate(
            seg.withColumn("__time", bucket),
            list(dimensions),
            aggregations,
            finalize=False,
            time_column="__time",
        )
        rolled.write.mode("overwrite").parquet(path)
        done.append(w.manifest.identifier)
    return done


def query_materialized(
    spark: SparkSession,
    table_root: str,
    data_source: str,
    name: str,
    interval: str | Interval | None = None,
    post_aggregations: list[dict] | None = None,
) -> DataFrame:
    """Answer the rollup from per-segment states only — raw rows are
    never rescanned. One state-merge shuffle on (bucket, dims); state
    volume is (buckets × dims cardinality) per segment, not rows."""
    from druid_hadoop_utils_spark.functions.aggregators import group_aggregate
    from druid_hadoop_utils_spark.sources.segments import (
        list_manifests,
        resolve_visible_windows,
    )

    mdir = _mat_dir(table_root, data_source, name)
    spec_path = os.path.join(mdir, "spec.json")
    if not os.path.exists(spec_path):
        raise FileNotFoundError(
            f"no materialized rollup {name!r} for {data_source} — run "
            "materialize_aggs first"
        )
    with open(spec_path) as f:
        spec = json.load(f)

    iv = Interval.parse(interval) if interval is not None else Interval.parse(
        "0001-01-01T00:00:00/9999-12-31T00:00:00")
    manifests = list_manifests(table_root, data_source)
    visible = resolve_visible_windows(manifests, iv)
    paths: list[str] = []
    for w in visible:
        if w.manifest.tombstone:
            continue
        if not w.is_fully_visible(iv):
            raise ValueError(
                f"segment {w.manifest.identifier} is only partially "
                "visible (overshadowed in part of its interval) — its "
                "whole-segment state would over-count; compact the table, "
                "re-run materialize_aggs, then query again"
            )
        p = _state_path(mdir, w.manifest.identifier)
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"segment {w.manifest.identifier} has no state for "
                f"{name!r} — run materialize_aggs to catch up (it only "
                "computes the missing segments)"
            )
        paths.append(p)
    if not paths:
        raise FileNotFoundError(
            f"no visible segments for {data_source} in {iv.iso()}"
        )
    states = spark.read.parquet(*paths)
    states = states.where(
        (F.col("__time") >= F.lit(iv.start.replace(tzinfo=None)))
        & (F.col("__time") < F.lit(iv.end.replace(tzinfo=None)))
    )
    return group_aggregate(
        states,
        spec["dimensions"],
        _merge_aggregations(spec["aggregations"]),
        post_aggregations=post_aggregations,
        finalize=True,
        time_column="__time",
    )


def vacuum_materialized(
    table_root: str, data_source: str, name: str
) -> list[str]:
    """Delete state files whose segment identifier is no longer listed in
    ANY manifest (vacuumed/killed segments) — overshadowed-but-listed
    segments keep their states (cheap, and a rollback via re-publish of
    the old version would reuse them). Returns deleted identifiers."""
    import shutil

    from druid_hadoop_utils_spark.sources.segments import _safe, list_manifests

    mdir = _mat_dir(table_root, data_source, name)
    if not os.path.isdir(mdir):
        return []
    listed = {_safe(m.identifier)
              for m in list_manifests(table_root, data_source)}
    gone = []
    for entry in os.listdir(mdir):
        if not entry.endswith(".parquet"):
            continue
        stem = entry[: -len(".parquet")]
        if stem not in listed:
            shutil.rmtree(os.path.join(mdir, entry), ignore_errors=True)
            gone.append(stem)
    return sorted(gone)
