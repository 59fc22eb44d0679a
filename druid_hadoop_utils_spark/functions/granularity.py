"""QueryGranularity → Column truncation (SURVEY.md §2.3 G1).

Named granularities match Druid 0.9.1's QueryGranularities set (reference:
PigSegmentLoadSpec.java:17-18,42 import + NONE default; sample-schema.json:2
"DAY"). Truncation is UTC-pinned (reference pins UTC at pom.xml:36-39 and the
engine session forces spark.sql.session.timeZone=UTC).

All expressions are JVM-side builtins (date_trunc / unix arithmetic), so they
stay inside whole-stage codegen — no UDFs in the time path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# calendar-aligned names → date_trunc unit (Spark and DuckDB both truncate
# WEEK to the ISO Monday, matching Druid/Joda weekOfWeekyear)
_TRUNC_UNITS = {
    "SECOND": "second",
    "MINUTE": "minute",
    "HOUR": "hour",
    "DAY": "day",
    "WEEK": "week",
    "MONTH": "month",
    "QUARTER": "quarter",
    "YEAR": "year",
}

# fixed-duration names → seconds
_DURATION_SECONDS = {
    "FIVE_MINUTE": 300,
    "TEN_MINUTE": 600,
    "FIFTEEN_MINUTE": 900,
    "THIRTY_MINUTE": 1800,
    "SIX_HOUR": 21600,
}

_PERIOD_RE = re.compile(
    r"^P(?:(?P<weeks>\d+)W)?(?:(?P<days>\d+)D)?"
    r"(?:T(?:(?P<hours>\d+)H)?(?:(?P<minutes>\d+)M)?(?:(?P<seconds>\d+)S)?)?$"
)


def _origin_seconds(origin) -> int:
    from druid_hadoop_utils_spark.intervals import parse_ts

    return int(parse_ts(origin).timestamp())


def _duration_trunc(col: Column, seconds: int, origin=None) -> Column:
    # floor(epoch/d)*d, all JVM-side; sub-second input floors to the bucket.
    # With an origin, buckets anchor to it instead of the epoch (Druid's
    # DurationGranularity origin): origin + floor((ts-origin)/d)*d.
    off = _origin_seconds(origin) % seconds if origin else 0
    base = F.unix_timestamp(col) - F.lit(off)
    return F.timestamp_seconds(
        F.floor(base / seconds).cast("long") * seconds + F.lit(off)
    )


def granularity_expr(granularity: str | dict, col: Column) -> Column:
    """Truncate a TimestampType column to the granularity bucket start.

    Accepts named granularities, ``{"type":"duration","duration":ms}``, and
    ``{"type":"period","period":"PT15M"}`` (day-or-smaller periods map to
    fixed durations; P1M/P1Y/P1W map to calendar truncation).
    """
    if isinstance(granularity, dict):
        gtype = granularity.get("type")
        tz = granularity.get("timeZone")
        origin = granularity.get("origin")
        if gtype == "duration":
            ms = int(granularity["duration"])
            if ms % 1000:
                raise ValueError("sub-second duration granularity unsupported")
            return _duration_trunc(col, ms // 1000, origin)
        if gtype == "period":
            return _period_expr(granularity["period"], col, tz, origin)
        raise ValueError(f"unknown granularity spec: {granularity!r}")

    g = granularity.upper()
    if g == "NONE":
        return col
    if g == "ALL":
        # Druid's ALL collapses everything into a single bucket; we pin the
        # bucket timestamp to the epoch.
        return F.lit("1970-01-01 00:00:00").cast("timestamp")
    if g in _TRUNC_UNITS:
        return F.date_trunc(_TRUNC_UNITS[g], col)
    if g in _DURATION_SECONDS:
        return _duration_trunc(col, _DURATION_SECONDS[g])
    raise ValueError(f"unknown granularity: {granularity!r}")


def _period_expr(period: str, col: Column, tz: str | None = None,
                 origin=None) -> Column:
    """PeriodGranularity: calendar periods truncate via date_trunc, fixed
    periods via duration floor. ``timeZone`` localizes the truncation frame
    (DST-correct for calendar periods: convert to local wall time, truncate,
    convert back — the bucket start is the UTC instant of the local
    boundary, matching Druid/Joda). ``origin`` anchors fixed periods; an
    origin on a calendar period is rejected (rare; Joda's chronology-origin
    math isn't worth approximating silently)."""
    p = period.upper()
    calendar = {"P1D": "day", "PT24H": "day", "P1W": "week", "P1M": "month",
                "P3M": "quarter", "P1Y": "year"}
    if p in calendar:
        if origin is not None:
            raise NotImplementedError(
                "origin on a calendar period granularity is not supported"
            )
        if tz:
            return F.to_utc_timestamp(
                F.date_trunc(calendar[p], F.from_utc_timestamp(col, tz)), tz
            )
        return F.date_trunc(calendar[p], col)
    m = _PERIOD_RE.match(p)
    if not m:
        raise ValueError(f"unparseable period: {period!r}")
    secs = (
        int(m.group("weeks") or 0) * 604800
        + int(m.group("days") or 0) * 86400
        + int(m.group("hours") or 0) * 3600
        + int(m.group("minutes") or 0) * 60
        + int(m.group("seconds") or 0)
    )
    if secs <= 0:
        raise ValueError(f"empty period: {period!r}")
    if tz:
        # sub-day fixed periods only shift for fractional-hour zones; floor
        # in the local wall-time frame, then return to UTC instants
        return F.to_utc_timestamp(
            _duration_trunc(F.from_utc_timestamp(col, tz), secs, origin), tz
        )
    return _duration_trunc(col, secs, origin)


def bucket_step_sql(granularity: str | dict) -> str:
    """The SQL INTERVAL literal stepping from one bucket start to the next
    (for empty-bucket enumeration). Raises for NONE (no bucket structure)
    and ALL (a single epoch bucket — no stepping)."""
    if isinstance(granularity, dict):
        gtype = granularity.get("type")
        if gtype == "duration":
            ms = int(granularity["duration"])
            if ms % 1000:
                raise ValueError("sub-second duration granularity unsupported")
            return f"INTERVAL {ms // 1000} SECOND"
        if gtype == "period":
            p = granularity["period"].upper()
            calendar = {"P1M": "INTERVAL 1 MONTH", "P3M": "INTERVAL 3 MONTH",
                        "P1Y": "INTERVAL 1 YEAR"}
            if p in calendar:
                return calendar[p]
            m = _PERIOD_RE.match(p)
            if not m:
                raise ValueError(f"unparseable period: {granularity['period']!r}")
            secs = (
                int(m.group("weeks") or 0) * 604800
                + int(m.group("days") or 0) * 86400
                + int(m.group("hours") or 0) * 3600
                + int(m.group("minutes") or 0) * 60
                + int(m.group("seconds") or 0)
            )
            if secs <= 0:
                raise ValueError(f"empty period: {granularity['period']!r}")
            return f"INTERVAL {secs} SECOND"
        raise ValueError(f"unknown granularity spec: {granularity!r}")
    g = granularity.upper()
    fixed = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400,
             "WEEK": 604800, **_DURATION_SECONDS}
    if g in fixed:
        return f"INTERVAL {fixed[g]} SECOND"
    if g == "MONTH":
        return "INTERVAL 1 MONTH"
    if g == "QUARTER":
        return "INTERVAL 3 MONTH"
    if g == "YEAR":
        return "INTERVAL 1 YEAR"
    raise ValueError(f"no bucket step for granularity: {granularity!r}")


def oracle_trunc_sql(granularity: str | dict, col_sql: str) -> str:
    """DuckDB SQL equivalent of granularity_expr, for oracle checks."""
    def duration_sql(secs: int) -> str:
        # CAST: DuckDB's to_timestamp returns TIMESTAMPTZ
        return (
            f"CAST(to_timestamp(floor(epoch({col_sql})/{secs})*{secs}) AS TIMESTAMP)"
        )

    if isinstance(granularity, dict):
        gtype = granularity.get("type")
        if gtype == "duration" and not granularity.get("origin"):
            return duration_sql(int(granularity["duration"]) // 1000)
        if gtype == "period":
            calendar = {"P1D": "day", "PT24H": "day", "P1W": "week",
                        "P1M": "month", "P3M": "quarter", "P1Y": "year"}
            p = granularity["period"].upper()
            tz = granularity.get("timeZone")
            if p in calendar and tz and not granularity.get("origin"):
                # localize → truncate → back to UTC instants (DuckDB's
                # timezone() flips direction on TIMESTAMP vs TIMESTAMPTZ)
                return (
                    f"CAST(timezone('{tz}', CAST(date_trunc('{calendar[p]}', "
                    f"timezone('{tz}', CAST({col_sql} AS TIMESTAMPTZ))) "
                    f"AS TIMESTAMP)) AS TIMESTAMP)"
                )
            if p in calendar and not tz:
                return f"CAST(date_trunc('{calendar[p]}', {col_sql}) AS TIMESTAMP)"
        raise ValueError(f"no oracle sql for granularity spec: {granularity!r}")
    g = granularity.upper()
    if g == "NONE":
        return col_sql
    if g == "ALL":
        return "TIMESTAMP '1970-01-01 00:00:00'"
    if g in _TRUNC_UNITS:
        unit = _TRUNC_UNITS[g]
        if g in {"SECOND", "MINUTE", "HOUR"}:
            return f"date_trunc('{unit}', {col_sql})"
        # DuckDB returns DATE for day-and-coarser truncation; Spark keeps
        # TimestampType — cast for value-hash parity
        return f"CAST(date_trunc('{unit}', {col_sql}) AS TIMESTAMP)"
    if g in _DURATION_SECONDS:
        return duration_sql(_DURATION_SECONDS[g])
    raise ValueError(f"unknown granularity: {granularity!r}")
