"""Event-sequence analytics: ordered funnels and cohort retention.

Druid's classic interactive-analytics workloads (the reference feeds a
Druid cluster whose dashboards ask exactly these questions of the event
stream) expressed as Spark plans over the raw events table.

Scale notes:
- every shuffle in this module is on the user key; the funnel's chained
  step joins therefore all hash-partition on the SAME key, and AQE/
  exchange-reuse keeps it to one physical repartitioning of each side;
- per-step frames shrink monotonically (step k+1 only joins users that
  reached step k), so the join inputs decay as the funnel narrows;
- cohort retention is two hash aggregates (first-seen, distinct active
  periods) joined on user — no windows over raw events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_seconds: float | None = None,
) -> DataFrame:
    """Per-user ordered funnel completion: one row per user who completed
    step 1, with ``t1..tk`` = the earliest time of each step that occurs
    STRICTLY AFTER the previous step's chosen time (NULL once the chain
    breaks). This is the standard greedy funnel semantics: taking the
    earliest valid time at each step maximizes the number of users who
    can complete the suffix.

    ``within_seconds`` adds the usual conversion horizon: later steps
    must fall within that many seconds of the user's step-1 time.
    Greedy-earliest stays optimal under the horizon (an earlier valid
    choice never tightens a later step's window).

    r15: the step-event frame is filtered to ``steps`` once and
    materialized via ``materialize_shared`` — the chained per-step
    join-aggregates are K consumers of the same source, and Catalyst
    duplicated the whole scan per consumer (the r14 q_funnel plan
    carried SIX parquet scans for a 3-step funnel). The materialized
    frame holds only funnel-step events projected to (user, ts, type) —
    the same volume every step join already shuffles. Below the size
    gate (operators/shared.py) the per-consumer re-scan is cheaper than
    the materialization job and the frame is left inline."""
    from druid_hadoop_utils_spark.operators.shared import materialize_shared

    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    ev = materialize_shared(
        df.select(F.col(user_col), F.col(ts_col), F.col(type_col)).where(
            F.col(type_col).isin(list(steps))
        ),
        site="events.funnel_times",
    )
    cur = (
        ev.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col(type_col) == step).withColumnRenamed(ts_col, "__ts")
        prev_t = F.col(f"t{i - 1}")
        # the "strictly after the previous step" constraint lives INSIDE
        # the aggregate (not a row filter) so a user whose chain breaks
        # keeps their row with t_i = NULL instead of disappearing;
        # `__ts > NULL` is NULL, so a broken chain stays broken.
        valid = F.col("__ts") > prev_t
        if within_seconds is not None:
            deadline = F.col("t1") + F.make_interval(
                secs=F.lit(float(within_seconds))
            )
            valid = valid & (F.col("__ts") <= deadline)
        cur = (
            cur.join(nxt, user_col, "left")
            .groupBy(*cur.columns)
            .agg(F.min(F.when(valid, F.col("__ts"))).alias(f"t{i}"))
        )
    return cur


def funnel_counts(
    df: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    round_to: int = 6,
    within_seconds: float | None = None,
) -> DataFrame:
    """Funnel summary — (step_idx, step, users, conversion) — where
    ``users`` counts users whose ordered chain reached the step and
    ``conversion`` is users / users(step 1)."""
    times = funnel_times(df, steps, user_col, ts_col, type_col,
                         within_seconds=within_seconds)
    reached = times.select(
        [
            F.count(F.col(f"t{i}")).cast("long").alias(f"t{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    # one row -> k rows via typed struct literals (no SQL string assembly
    # — a quote in a step name must not break the query)
    structs = F.array(*[
        F.struct(
            F.lit(i).alias("step_idx"),
            F.lit(s).alias("step"),
            F.col(f"t{i}").alias("users"),
        )
        for i, s in enumerate(steps, start=1)
    ])
    out = reached.select(F.explode(structs).alias("__s")).select("__s.*")
    first = out.where(F.col("step_idx") == 1).select(
        F.col("users").alias("__first")
    )
    return (
        out.crossJoin(F.broadcast(first))
        .select(
            "step_idx",
            "step",
            "users",
            F.round(
                F.when(F.col("__first") > 0, F.col("users") / F.col("__first")),
                round_to,
            ).alias("conversion"),
        )
        .orderBy("step_idx")
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: int | None = None,
) -> DataFrame:
    """Cohort retention triangle — (cohort, offset, users) — users whose
    FIRST event falls in ``cohort`` (date_trunc period) and who are active
    ``offset`` periods later. offset 0 is the cohort size itself.

    ``period`` is any date_trunc unit (week/day/month). Offsets are
    computed on truncated dates, so months use calendar-month arithmetic
    and week/day use exact day deltas.

    r15: the distinct (user, period) activity frame is materialized via
    ``materialize_shared`` — it feeds both the cohort-min aggregate and
    the retention join, and Catalyst duplicated the scan + distinct per
    consumer (two full event scans in the r14 q_cohort_retention plan).
    The frame is users × active-periods — already the join's shuffle
    volume. Below the size gate (operators/shared.py) the duplicate
    scan+distinct is cheaper than the materialization job and the frame
    is left inline."""
    from druid_hadoop_utils_spark.operators.shared import materialize_shared

    bucket = F.date_trunc(period, F.col(ts_col))
    active = materialize_shared(
        df.select(F.col(user_col), bucket.alias("__p")).distinct(),
        site="events.cohort_retention",
    )
    first = active.groupBy(user_col).agg(F.min("__p").alias("__cohort"))
    joined = active.join(first, user_col)
    if period == "month":
        offset = (
            (F.year("__p") - F.year("__cohort")) * 12
            + (F.month("__p") - F.month("__cohort"))
        ).cast("long")
    else:
        days = F.datediff(F.col("__p"), F.col("__cohort"))
        offset = (days / (7 if period == "week" else 1)).cast("long")
    out = (
        joined.select(
            F.col("__cohort").cast("date").alias("cohort"),
            offset.alias("offset"),
            F.col(user_col),
        )
        .groupBy("cohort", "offset")
        .agg(F.count_distinct(F.col(user_col)).cast("long").alias("users"))
    )
    if max_offset is not None:
        out = out.where(F.col("offset") <= max_offset)
    return out.orderBy("cohort", "offset")


def event_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Markov-style transition counts between consecutive events per user
    — (from_type, to_type, n, n_users) — the input to path/Sankey
    analyses and next-event prediction baselines.

    One exchange on the user key for the lag window (ordered by time,
    event-type tiebreak so simultaneous events have a deterministic
    order), then one hash aggregate over the transition pairs."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, type_col)
    pairs = (
        df.select(F.col(user_col), F.col(ts_col), F.col(type_col))
        .withColumn("__prev", F.lag(type_col).over(w))
        .where(F.col("__prev").isNotNull())
    )
    return (
        pairs.groupBy(
            F.col("__prev").alias("from_type"), F.col(type_col).alias("to_type")
        )
        .agg(
            F.count("*").alias("n"),
            F.count_distinct(F.col(user_col)).alias("n_users"),
        )
    )


def stickiness(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    round_to: int = 6,
) -> DataFrame:
    """Weekly engagement depth — (week, dau_avg, wau, stickiness) — the
    DAU/WAU ratio: average daily active users over the week divided by
    the week's active users. Two hash aggregates over (user, day)
    distinct pairs; no windows over raw events.

    r15: the distinct (user, week, day) frame is materialized via
    ``materialize_shared`` — it feeds both the DAU and the WAU branch,
    and Catalyst duplicated the scan + distinct per consumer (two full
    event scans in the audit plan). The frame is users × active-days —
    already both branches' shuffle volume. Below the size gate
    (operators/shared.py) the duplicate scan+distinct is cheaper than
    the materialization job and the frame is left inline."""
    from druid_hadoop_utils_spark.operators.shared import materialize_shared

    daily = materialize_shared(
        df.select(
            F.col(user_col),
            F.date_trunc("week", F.col(ts_col)).alias("week"),
            F.date_trunc("day", F.col(ts_col)).alias("day"),
        ).distinct(),
        site="events.stickiness",
    )
    dau = daily.groupBy("week", "day").agg(
        F.count_distinct(F.col(user_col)).alias("__dau")
    )
    dau_avg = dau.groupBy("week").agg(F.avg("__dau").alias("dau_avg"))
    wau = daily.groupBy("week").agg(
        F.count_distinct(F.col(user_col)).alias("wau")
    )
    return (
        dau_avg.join(wau, "week")
        .select(
            "week",
            F.round("dau_avg", round_to).alias("dau_avg"),
            F.col("wau").cast("long").alias("wau"),
            F.round(F.col("dau_avg") / F.col("wau"), round_to).alias("stickiness"),
        )
        .orderBy("week")
    )
