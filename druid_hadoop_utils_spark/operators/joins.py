"""Join utilities for skewed keys at scale.

AQE's skew-join splitting (on in the engine session) handles most skew at
runtime; ``salted_join`` is the explicit fallback for pathological cases —
a hot key whose single shuffle partition would still dominate a stage:

- the probe (large) side gets a deterministic salt in [0, salts);
- the build side is replicated once per salt value (an ``explode`` of a
  salt array — build-side rows × salts, acceptable when the build side is
  the smaller input);
- the join key becomes (key, salt), spreading each hot key over ``salts``
  shuffle partitions.

Results are identical to the unsalted join (verified by tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    keys: list[str],
    right_cols: list[str] | None = None,
    suffix: str = "",
) -> DataFrame:
    """AS-OF join: attach to each left row the MOST RECENT right row with
    ``right.on <= left.on`` in the same key group — the time-series join
    Spark lacks natively (DuckDB spells it ASOF JOIN; kdb calls it aj).

    Implemented as union + window instead of a range join: tag both
    sides, union them, and carry the right row forward with
    ``last(..., ignorenulls)`` over (keys ORDER BY on, side) — a right row
    at the exact left timestamp wins (<= semantics). ONE shuffle on the
    keys, no range-condition nested-loop join, no right-side broadcast
    requirement: both sides can be arbitrarily large.

    The right columns travel as ONE struct, so every output column comes
    from the SAME most-recent right row and a stored null in that row
    survives (carrying columns independently would let an older row's
    value leak through a null — DuckDB ASOF JOIN, the oracle, never mixes
    rows).
    """
    from pyspark.sql import Window

    rcols = right_cols or [c for c in right.columns if c != on and c not in keys]
    if not rcols:
        raise ValueError("asof_join: no right columns to attach")
    out_names = {c: f"{c}{suffix}" for c in rcols}
    clash = [out_names[c] for c in rcols if out_names[c] in left.columns]
    if clash:
        raise ValueError(f"right columns collide with left: {clash}; pass suffix=")

    r = right.select(
        *keys, F.col(on),
        F.struct(*[F.col(c).alias(c) for c in rcols]).alias("__rrow"),
    ).withColumn("__side", F.lit(0))
    l = left.withColumn("__side", F.lit(1))
    # left rows get a null __rrow via allowMissingColumns, which ignorenulls
    # skips; a right row's struct is non-null even when its fields are null
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(on), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__rrow", ignorenulls=True).over(w)
    return (
        unioned.withColumn("__carried", carried)
        .where(F.col("__side") == 1)
        .select(
            *left.columns,
            *[F.col("__carried")[c].alias(out_names[c]) for c in rcols],
        )
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lower: str,
    right_upper: str,
    keys: list[str],
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: left rows match right rows whose half-open
    ``[lower, upper)`` contains the left point (same key group) — binned
    into an EQUI-join, the scale pattern for what Spark would otherwise
    plan as a broadcast nested-loop range join.

    Each right interval explodes over the bins it covers (≈ span /
    bin_width rows); each left point maps to exactly one bin; the
    (keys, bin) hash join meets them and the exact range predicate
    filters bin-edge false positives. No pair is produced twice — a point
    lives in one bin. Pick ``bin_width`` near the typical interval span:
    replication stays ~1-2× while the join stays a hash join.

    Timestamp columns are compared as epoch seconds (``bin_width`` in
    seconds then).
    """
    if how not in {"inner", "left"}:
        raise ValueError(f"range_join supports inner/left, got {how!r}")

    def as_num(df: DataFrame, col: str):
        # timestamps compare as (fractional) epoch seconds
        return F.col(col).cast("double")

    r = (
        right.withColumn("__rlo", as_num(right, right_lower))
        .withColumn("__rhi", as_num(right, right_upper))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("__rlo") / bin_width).cast("long"),
                    F.floor(F.col("__rhi") / bin_width).cast("long"),
                )
            ),
        )
    )
    for k in keys:
        r = r.withColumnRenamed(k, f"__rk_{k}")
    l = left.withColumn("__lp", as_num(left, left_point)).withColumn(
        "__bin", F.floor(F.col("__lp") / bin_width).cast("long")
    )
    cond = None
    for a, b in [("__bin", "__bin")] + [(k, f"__rk_{k}") for k in keys]:
        c = l[a] == r[b]
        cond = c if cond is None else cond & c
    # exact half-open range check resolves bin-edge false positives
    in_range = (r["__rlo"] <= l["__lp"]) & (l["__lp"] < r["__rhi"])
    matched = l.join(r, cond & in_range, "inner").drop(l["__bin"]).drop(r["__bin"])
    helpers = ["__lp", "__rlo", "__rhi", *[f"__rk_{k}" for k in keys]]
    if how == "inner":
        return matched.drop(*helpers)
    # left join: rows with no candidate IN RANGE (not merely no bin-mate)
    # come back with null right columns. A left_anti with the SAME equi keys
    # + range condition — no row ids, no persist (the round-2 version pinned
    # the whole probe side in memory); both joins shuffle l on (bin, keys)
    # identically so the exchange is reused.
    unmatched = l.join(r, cond & in_range, "left_anti").drop("__bin")
    out = matched.unionByName(unmatched, allowMissingColumns=True)
    return out.drop(*helpers)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lower: str,
    left_upper: str,
    right_lower: str,
    right_upper: str,
    keys: list[str],
    bin_width: float,
    suffix: str = "_r",
) -> DataFrame:
    """Interval × interval OVERLAP join: emit (l, r) when the half-open
    intervals ``[l.lower, l.upper)`` and ``[r.lower, r.upper)`` intersect
    within the same key group — the range×range generalization of
    ``range_join`` (point×range). Spark plans the naive formulation as a
    broadcast-nested-loop; here BOTH sides explode over the fixed-width
    bins their interval covers and meet in an EQUI hash join on
    (keys, bin), so the plan is shuffle-hash/sort-merge and scales to two
    arbitrarily large inputs.

    A pair whose overlap spans k bins would meet k times; instead of a
    ``distinct`` over the full output, each pair is emitted ONLY from the
    first bin of its intersection (``bin == floor(max(l.lo, r.lo) /
    bin_width)``) — exactly-once without a dedup shuffle.

    Timestamps compare as fractional epoch seconds (``bin_width`` in
    seconds). Pick ``bin_width`` near the typical interval span:
    replication stays ~(span/bin_width + 1)× per side.
    """

    def binned(df: DataFrame, lower: str, upper: str, lo_name: str, hi_name: str):
        out = df.withColumn(lo_name, F.col(lower).cast("double")).withColumn(
            hi_name, F.col(upper).cast("double")
        )
        # a half-open interval covers bins floor(lo/w) .. floor(hi/w), the
        # last one only when hi is not exactly on the bin edge — harmless
        # to include (the overlap predicate rejects edge false positives)
        return out.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo_name) / bin_width).cast("long"),
                    F.floor(F.col(hi_name) / bin_width).cast("long"),
                )
            ),
        )

    l = binned(left, left_lower, left_upper, "__llo", "__lhi")
    r = binned(right, right_lower, right_upper, "__rlo", "__rhi")
    for k in keys:
        r = r.withColumnRenamed(k, f"__rk_{k}")
    renames = {
        c: (f"{c}{suffix}" if c in left.columns else c)
        for c in right.columns
        if c not in keys
    }
    clash = [v for v in renames.values() if v in left.columns]
    if clash:
        raise ValueError(f"right columns collide with left: {clash}; pass suffix=")
    for old, new in renames.items():
        if old != new:
            r = r.withColumnRenamed(old, new)

    cond = l["__bin"] == r["__bin"]
    for k in keys:
        cond = cond & (l[k] == r[f"__rk_{k}"])
    # the classic lo<hi' && lo'<hi formula assumes non-empty intervals; the
    # extra guards make an empty [x, x) interval match nothing
    overlap = (
        (l["__llo"] < r["__rhi"]) & (r["__rlo"] < l["__lhi"])
        & (l["__llo"] < l["__lhi"]) & (r["__rlo"] < r["__rhi"])
    )
    first_bin = l["__bin"] == F.floor(
        F.greatest(l["__llo"], r["__rlo"]) / bin_width
    ).cast("long")
    out = l.join(r, cond & overlap & first_bin, "inner")
    helpers = ["__llo", "__lhi", "__rlo", "__rhi", "__bin",
               *[f"__rk_{k}" for k in keys]]
    return out.drop(l["__bin"]).drop(r["__bin"]).drop(
        *[h for h in helpers if h != "__bin"]
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salts: int = 8,
) -> DataFrame:
    """Join ``large ⋈ small`` on column ``on`` with salt-spread hot keys.

    ``how`` supports inner/left (the large side is preserved); the salt
    columns never escape this function.
    """
    if how not in {"inner", "left"}:
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_large = large.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts))
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    out = salted_large.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")
