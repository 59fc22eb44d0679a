"""Time-series post-processing over rolled-up series: moving windows,
deltas, and anomaly flags.

Druid's timeseries query ends at the granularity bucket (see
functions/granularity.py and the native-query path in api.py); real
dashboards and data-quality monitors immediately post-process that series
— smoothing, rate-of-change, outlier flagging. These operators take any
(keys, time, value) frame — typically the output of ``rollup_df`` or a
granularity bucket aggregate — and stay entirely in Catalyst window
expressions.

Scale: the input is a ROLLED-UP series (bucket cardinality, not raw
events), so the per-key window sort is over #buckets-per-key rows — the
rollup aggregate has already collapsed the 100 TB. One exchange on the
series keys, reused by every window expression in the same plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _series_window(keys: Sequence[str], ts_col: str) -> Window:
    w = Window.orderBy(ts_col)
    return w if not keys else Window.partitionBy(*keys).orderBy(ts_col)


def smooth(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    preceding: int = 3,
    round_to: int | None = 6,
) -> DataFrame:
    """Trailing moving average over ``preceding`` prior points + current
    (ROWS frame, partial at the series head like every SQL engine)."""
    w = _series_window(keys, ts_col).rowsBetween(-preceding, 0)
    out = F.avg(value_col).over(w)
    if round_to is not None:
        out = F.round(out, round_to)
    return df.withColumn("moving_avg", out)


def delta(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    round_to: int | None = 6,
) -> DataFrame:
    """Point-over-point change (NULL at each series head)."""
    w = _series_window(keys, ts_col)
    out = F.col(value_col) - F.lag(value_col).over(w)
    if round_to is not None:
        out = F.round(out, round_to)
    return df.withColumn("delta", out)


def zscore_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    threshold: float = 3.0,
    round_to: int | None = 6,
) -> DataFrame:
    """Per-key z-score and outlier flag against the key's own
    mean/stddev (population stddev; keys with a single point or zero
    variance get z = NULL, outlier = false).

    Uses an unbounded window over the key partition so the stats exchange
    reuses the same hash partitioning as ``smooth``/``delta`` when
    composed in one plan — no second aggregate-and-join pass."""
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    mean = F.avg(value_col).over(w)
    sd = F.stddev_pop(value_col).over(w)
    z = F.when(sd > 0, (F.col(value_col) - mean) / sd)
    if round_to is not None:
        z = F.round(z, round_to)
    return df.withColumn("zscore", z).withColumn(
        "is_outlier", F.coalesce(F.abs(F.col("zscore")) > threshold, F.lit(False))
    )


def mad_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    threshold: float = 3.5,
    round_to: int | None = 6,
) -> DataFrame:
    """Robust per-key outlier flags via the median absolute deviation
    (Iglewicz-Hoaglin modified z-score: 0.6745·(x − median)/MAD, flag at
    |z| > 3.5). Unlike ``zscore_outliers``, the statistics themselves are
    not dragged by the outliers they're meant to find.

    Two window passes over the SAME key partitioning (exact median, then
    median of absolute deviations) — the second Window reuses the first's
    exchange, so the plan still shuffles once. Zero-MAD keys (constant
    series) get z = NULL, outlier = false."""
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    med = F.percentile(F.col(value_col), F.lit(0.5)).over(w)
    step1 = df.withColumn("__med", med)
    mad = F.percentile(F.abs(F.col(value_col) - F.col("__med")), F.lit(0.5)).over(w)
    step2 = step1.withColumn("__mad", mad)
    z = F.when(
        F.col("__mad") > 0,
        F.lit(0.6745) * (F.col(value_col) - F.col("__med")) / F.col("__mad"),
    )
    if round_to is not None:
        z = F.round(z, round_to)
    return (
        step2.withColumn("mad_z", z)
        .withColumn(
            "is_outlier", F.coalesce(F.abs(F.col("mad_z")) > threshold, F.lit(False))
        )
        .drop("__med", "__mad")
    )
