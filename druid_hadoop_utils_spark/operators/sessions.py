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
