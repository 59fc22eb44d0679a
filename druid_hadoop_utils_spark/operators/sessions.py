"""Sessionization: group event streams into activity sessions separated by
an inactivity gap — built on Spark's native ``session_window``, so the SAME
code runs batch and Structured Streaming (with a watermark, state is
bounded and sessions merge across micro-batches).

Semantics (pinned by tests): an event extends its session while it
arrives at or before ``previous event + gap`` (the boundary is INCLUSIVE —
an event at exactly ``previous + gap`` merges); ``session_start`` is the
first event's timestamp and ``session_end`` is last event + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    time_column: str = "ts",
    keys: list[str] | None = None,
    gap: str = "30 minutes",
    aggs: list | None = None,
) -> DataFrame:
    """One row per (keys, session): session_start/session_end + aggregates.

    Works on batch and streaming DataFrames alike (add ``withWatermark``
    upstream for streaming).
    """
    keys = keys or []
    aggs = aggs or [F.count("*").alias("n_events")]
    grouped = events.groupBy(
        F.session_window(F.col(time_column), gap).alias("__s"), *keys
    ).agg(*aggs)
    agg_names = [c for c in grouped.columns if c != "__s" and c not in keys]
    return grouped.select(
        F.col("__s.start").alias("session_start"),
        F.col("__s.end").alias("session_end"),
        *keys,
        *agg_names,
    )


def forward_fill(
    df: DataFrame,
    keys: list[str],
    time_col: str | list[str],
    cols: list[str],
    suffix: str = "_ffill",
) -> DataFrame:
    """Per-key forward fill: each null in ``cols`` takes the latest
    non-null value at or before its timestamp — the standard gap-filling
    step for sparse metric streams (sensor readings, sparse events onto a
    dense grid).

    One window per key ordered by time with ``last(..., ignorenulls)``
    over the unbounded-preceding frame — a single shuffle on the keys,
    running-state evaluation within each partition (no per-row rescan of
    the frame). Rows before a key's first observation stay null.

    ``time_col`` may be a list to break timestamp ties deterministically
    (e.g. ``["ts", "event_id"]``) — with ties unbroken, which duplicate
    "wins" the fill is partition-layout-dependent.
    """
    from pyspark.sql import Window

    if not cols:
        raise ValueError("forward_fill: need at least one column to fill")
    order = [time_col] if isinstance(time_col, str) else list(time_col)
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(F.col(c), ignorenulls=True).over(w)
        )
    return out
