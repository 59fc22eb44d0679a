"""Mergeable quantile sketch as a pure-DataFrame composition.

The reference's two-phase protocol (partial state → merge → finalize,
SURVEY.md §2.5 A3/A4) applied to a sketch the reference lacks: a
fixed-range binned histogram. The state is SELF-DESCRIBING —
``struct<lo double, hi double, counts array<long>>`` — so downstream
post-aggregations (Druid ``quantile`` / ``quantiles``) need no side-channel
parameters, mirroring how Druid's approxHistogram object carries its own
bounds. Everything is built-in Catalyst expressions:

- partial: ``width_bucket`` assigns each value a bucket; one sum per
  bucket builds the count array (whole-stage codegen, map-side partials);
- merge: element-wise sum of count arrays (bounds must match — states from
  different segments/days/streams combine losslessly, like HLL partials);
- finalize: a single ``aggregate`` fold walks the cumulative counts to the
  q-th quantile's bucket and returns its midpoint.

Error is bounded by the bucket width ((hi-lo)/bins); values outside
[lo, hi) land in underflow/overflow buckets and clamp to the range edges.
Deterministic — the same math is expressible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BINS = 128


def qhist_state(
    col: Column | str, lo: float, hi: float, bins: int = DEFAULT_BINS
) -> Column:
    """Partial aggregate: self-describing histogram state with bucket
    counts of length bins+2 (index 0 = underflow, bins+1 = overflow) —
    the non-finalizing form."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    bucket = F.width_bucket(c, F.lit(float(lo)), F.lit(float(hi)), F.lit(bins))
    counts = F.array(
        *[
            # coalesce: sum over an empty group is NULL, state must be 0s
            F.coalesce(F.sum(F.when(bucket == i, 1).otherwise(0)), F.lit(0)).cast("long")
            for i in range(bins + 2)
        ]
    )
    return F.struct(
        F.lit(float(lo)).alias("lo"), F.lit(float(hi)).alias("hi"), counts.alias("counts")
    )


def qhist_merge(state_col: Column | str, bins: int = DEFAULT_BINS) -> Column:
    """Merge partial states (element-wise count sum; identical bounds
    assumed) — re-aggregation across groups, matching the reference's
    partial-bytes re-merge."""
    c = F.col(state_col) if isinstance(state_col, str) else state_col
    counts = F.array(*[F.sum(c["counts"][i]).cast("long") for i in range(bins + 2)])
    return F.struct(
        F.first(c["lo"]).alias("lo"), F.first(c["hi"]).alias("hi"), counts.alias("counts")
    )


def qhist_quantile(state: Column | str, q: float) -> Column:
    """Finalize: the q-quantile estimate (bucket midpoint; underflow →
    lo, overflow → hi). One fold over the state's count array; the bounds
    come from the state itself."""
    s = F.col(state) if isinstance(state, str) else state
    lo, hi, counts = s["lo"], s["hi"], s["counts"]
    bins = F.size(counts) - 2
    total = F.aggregate(counts, F.lit(0).cast("long"), lambda a, x: a + x)
    target = (F.lit(float(q)) * total.cast("double"))
    acc0 = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(-1).alias("idx"),
        F.lit(0).alias("pos"),
    )

    def step(acc, x):
        new_cum = acc["cum"] + x
        found = F.when(
            (acc["idx"] < 0) & (new_cum.cast("double") >= target) & (total > 0),
            acc["pos"],
        ).otherwise(acc["idx"])
        return F.struct(
            new_cum.alias("cum"), found.alias("idx"), (acc["pos"] + 1).alias("pos")
        )

    idx = F.aggregate(counts, acc0, step)["idx"]
    width = (hi - lo) / bins
    mid = lo + (idx.cast("double") - 0.5) * width
    return (
        F.when(total == 0, F.lit(None).cast("double"))
        .when(idx <= 0, lo)
        .when(idx >= bins + 1, hi)
        .otherwise(mid)
    )


def qhist_state_grouped(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    bins: int = DEFAULT_BINS,
) -> DataFrame:
    """Histogram state per group via a (group, bucket) COUNT pre-aggregate
    instead of the ``qhist_state`` expression's bins+2 conditional sums.

    Identical state values; very different cost profile: per row this path
    evaluates ONE ``width_bucket`` and a plain count (vs bins+2 when-chains
    that also take seconds to codegen-compile at bins=100+). The extra
    shuffle is on (group, bucket) with map-side combine — at most bins+2
    rows per group per partition — and the dense array assembles from the
    sparse pairs on the handful of final rows. Preferred whenever state
    construction doesn't have to be a single aggregate expression.

    Expressions are built as SQL strings (``selectExpr``/``F.expr``):
    the Column-API construction of the same plan cost ~0.13 s of py4j
    round-trips per query (round 11, the kll_quantiles finding); the
    JVM plan is identical."""

    def _q(c: str) -> str:
        return "`" + c.replace("`", "``") + "`"

    qg = [_q(c) for c in group_cols]
    bucket_sql = (
        f"width_bucket(cast({_q(value_col)} AS double), "
        f"cast({float(lo)!r} AS double), cast({float(hi)!r} AS double), "
        f"{int(bins)})"
    )
    per_bucket = (
        df.selectExpr(*qg, f"{bucket_sql} AS __bk")
        .groupBy(*group_cols, "__bk")
        .agg(F.expr("count(*) AS __c"))
    )
    # Null values bucket to NULL; a null map key would fail at runtime
    # (NULL_MAP_KEY) and the qhist_state expression path ignores nulls.
    # collect_list skips null entries, so the CASE drops the null bucket
    # while an all-null group still surfaces with a zero-count state.
    pairs = F.expr(
        "map_from_entries(collect_list("
        "CASE WHEN __bk IS NOT NULL THEN struct(__bk, __c) END)) AS __m"
    )
    agged = (
        per_bucket.groupBy(*group_cols).agg(pairs)
        if group_cols
        else per_bucket.agg(pairs)
    )
    counts_sql = (
        f"transform(sequence(0, {int(bins) + 1}), "
        "i -> cast(coalesce(try_element_at(__m, i), 0) AS bigint))"
    )
    state_sql = (
        f"struct(cast({float(lo)!r} AS double) AS lo, "
        f"cast({float(hi)!r} AS double) AS hi, {counts_sql} AS counts)"
    )
    return agged.selectExpr(*qg, f"{state_sql} AS __qh")


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: list[float],
    lo: float,
    hi: float,
    bins: int = DEFAULT_BINS,
) -> DataFrame:
    """Grouped quantile estimates via the two-stage state build.

    The finalize is the same cumulative-walk fold as ``qhist_quantile``
    but built as SQL strings over the named state column — identical
    JVM plan, a fraction of the py4j construction cost (round 11; the
    Column-API ``qhist_quantile`` stays for callers finalizing an
    arbitrary state EXPRESSION, e.g. the approxHistogram aggregator)."""

    def _q(c: str) -> str:
        return "`" + c.replace("`", "``") + "`"

    qg = [_q(c) for c in group_cols]
    st = qhist_state_grouped(df, value_col, group_cols, lo, hi, bins)
    names = [f"p{int(q * 100)}" for q in quantiles]
    t1 = st.selectExpr(
        *qg, "__qh",
        "aggregate(__qh.counts, cast(0 AS bigint), (a, x) -> a + x) AS __tot",
    )
    idx_cols = [
        "aggregate(__qh.counts, "
        "named_struct('cum', cast(0 AS bigint), 'idx', -1, 'pos', 0), "
        "(acc, x) -> struct(acc.cum + x AS cum, "
        f"CASE WHEN acc.idx < 0 AND cast(acc.cum + x AS double) >= "
        f"{float(q)!r} * cast(__tot AS double) AND __tot > 0 "
        f"THEN acc.pos ELSE acc.idx END AS idx, "
        f"acc.pos + 1 AS pos)).idx AS __idx_{n}"
        for q, n in zip(quantiles, names)
    ]
    t2 = t1.selectExpr(
        *qg, "__qh.lo AS __lo", "__qh.hi AS __hi",
        "size(__qh.counts) - 2 AS __bins", "__tot", *idx_cols,
    )
    outs = [
        f"CASE WHEN __tot = 0 THEN cast(NULL AS double) "
        f"WHEN __idx_{n} <= 0 THEN __lo "
        f"WHEN __idx_{n} >= __bins + 1 THEN __hi "
        f"ELSE __lo + (cast(__idx_{n} AS double) - 0.5) * "
        f"((__hi - __lo) / __bins) END AS {n}"
        for n in names
    ]
    return t2.selectExpr(*qg, *outs)


def rank_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    quantiles: list[float],
    interpolation: str = "lower",
) -> DataFrame:
    """EXACT grouped quantiles by rank, without sorting the raw rows and
    without the fixed [lo, hi) range the histogram state needs.

    ``interpolation="lower"`` (default) is discrete: for n non-null
    values, quantile q is the value whose 1-indexed rank in sorted order
    is ``ceil(q*n)`` (q=0 → rank 1, the minimum; q=1 → rank n, the
    maximum). ``interpolation="linear"`` is the type-7 continuous
    estimator (SQL ``quantile_cont`` / numpy default): with
    h = (n-1)·q + 1, linearly interpolate between the values at ranks
    ⌊h⌋ and ⌈h⌉.

    Shape: (group, value) COUNT pre-aggregate (map-side combine collapses
    duplicates before the shuffle) → cumulative count window per group
    ordered by value → one row per requested q via a conditional min. The
    heavy input shuffles ONCE, keyed by (group, value) at distinct-value
    cardinality — never a global sort of raw rows; the window runs over
    the collapsed per-group distribution. For a group whose values are all
    distinct this degrades to the sort-based cost; for typical metric
    distributions the collapse is 10-1000×.
    """
    from pyspark.sql import Window

    if not quantiles:
        raise ValueError("rank_quantiles: need at least one quantile")
    c = F.col(value_col).cast("double")
    per_value = (
        df.where(c.isNotNull())
        .select(*group_cols, c.alias("__v"))
        .groupBy(*group_cols, "__v")
        .agg(F.count("*").alias("__c"))
    )
    w = Window.partitionBy(*group_cols).orderBy("__v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy(*group_cols)
    cum = per_value.withColumn("__cum", F.sum("__c").over(w)).withColumn(
        "__n", F.sum("__c").over(wall)
    )
    if interpolation not in {"lower", "linear"}:
        raise ValueError(f"unknown interpolation: {interpolation!r}")

    def at_rank(rank_col):
        # smallest value whose cumulative count reaches the rank
        return F.min(F.when(F.col("__cum") >= rank_col, F.col("__v")))

    cols = []
    for q in quantiles:
        name = f"p{int(round(q * 100))}"
        if interpolation == "lower":
            # rank(q) = max(ceil(q*n), 1)
            rank = F.greatest(F.ceil(F.lit(float(q)) * F.col("__n")), F.lit(1))
            cols.append(at_rank(rank).alias(name))
        else:
            # type-7 with the ZERO-based h = (n-1)q DuckDB/numpy compute
            # internally (computing (n-1)q + 1 instead can round to a
            # different fractional part in float64 and diverge from the
            # oracle by an ulp): interpolate between 1-indexed ranks
            # ⌊h⌋+1 and ⌈h⌉+1 by frac = h - ⌊h⌋
            h = (F.col("__n") - F.lit(1)).cast("double") * F.lit(float(q))
            lo = at_rank(F.floor(h) + F.lit(1))
            hi = at_rank(F.ceil(h) + F.lit(1))
            frac = F.max(h - F.floor(h))  # constant per group
            cols.append((lo + frac * (hi - lo)).alias(name))
    if group_cols:
        return cum.groupBy(*group_cols).agg(*cols)
    return cum.agg(*cols)
