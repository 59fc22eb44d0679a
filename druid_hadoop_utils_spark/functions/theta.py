"""KMV (k-minimum-values) theta-sketch-style distinct counting.

Druid clusters commonly run the DataSketches ``thetaSketch`` aggregator
next to ``hyperUnique``; Spark 4 ships no theta builtin, so the engine
carries its own KMV state — the classic theta-sketch construction — as
PURE expressions (no UDF, no Python in the hot path):

- **state**: the ``k`` smallest distinct seeded-xxhash64 values of the
  group, as a sorted ``array<long>`` — self-describing and mergeable;
- **merge**: union → distinct → sort → first ``k`` (still an expression);
- **estimate**: exact ``|state|`` while the state is under-full (theta=1 —
  which also makes small-cardinality results ORACLE-EXACT against
  ``count(distinct)``), else the standard ``(k-1)/theta`` KMV estimator
  with theta = the k-th minimum mapped onto [0, 1).

Scale note: the sliced state is bounded at ``k`` longs, but the
expression path builds it through a per-group ``collect_set`` of distinct
hashes — the same transient-memory class as exact count-distinct. For
unbounded groups use ``kmv_distinct``: dedupe hashes on a (keys, hash)
shuffle with map-side partial aggregation, then keep the k smallest per
key with a window — two shuffles, memory bounded at k per group.

Wired into the AggregatorFactory grammar as ``{"type": "thetaSketch",
"fieldName": ..., "size": k}`` (functions/aggregators.agg_expr), matching
the Druid extension's JSON shape; ``thetaSketchEstimate`` post-aggs map in
post_agg_expr.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

DEFAULT_K = 16384  # the Druid thetaSketch extension's default "size"
DEFAULT_SEED = 9001

_TWO_64 = 2.0 ** 64


def kmv_hash(col: Column, seed: int = DEFAULT_SEED) -> Column:
    # null-safe: xxhash64(null) would hash to a CONSTANT and pollute the
    # sketch (nulls don't count as a distinct value — hyperUnique parity);
    # collect_set / distinct then drop the null hash
    return F.when(col.isNotNull(), F.xxhash64(col, F.lit(seed)))


def kmv_state(col: Column, k: int = DEFAULT_K, seed: int = DEFAULT_SEED) -> Column:
    """Aggregate expression: KMV state from RAW values."""
    return F.slice(F.array_sort(F.collect_set(kmv_hash(col, seed))), 1, k)


def kmv_merge(col: Column, k: int = DEFAULT_K) -> Column:
    """Aggregate expression: merge pre-built KMV states (array<long>)."""
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(col)))), 1, k
    )


def kmv_merge_two(a: Column, b: Column, k: int = DEFAULT_K) -> Column:
    """Scalar expression: union of two states (for post-agg arithmetic)."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_estimate(state: Column, k: int = DEFAULT_K) -> Column:
    """Distinct estimate from a KMV state: exact while under-full, else
    (k-1)/theta with theta = normalized k-th minimum hash. Signed longs
    map onto [0,1) via h/2^64 + 1/2 (xxhash64 is uniform over int64).

    ``k`` must be the k the state was built with (the under-full test is
    size < k); unlike DataSketches bytes the array state doesn't carry its
    own k — keep aggregator and finalizer sizes consistent."""
    kth = F.try_element_at(state, F.lit(k)).cast("double")
    theta = kth / F.lit(_TWO_64) + F.lit(0.5)
    return F.when(F.size(state) < k, F.size(state).cast("double")).otherwise(
        F.lit(float(k - 1)) / theta
    )


def is_kmv_state(dtype) -> bool:
    return isinstance(dtype, ArrayType) and isinstance(dtype.elementType, LongType)


def kmv_distinct(
    df: DataFrame,
    keys: list[str],
    col: str,
    k: int = DEFAULT_K,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Memory-bounded KMV per key group: (keys..., kmv array<long>,
    estimate double).

    Plan shape: distinct on (keys, hash) — one shuffle with map-side
    partial dedup — then a per-key window keeps only the k smallest
    hashes before the state assembles. No step holds more than k hashes
    per group on the reduce side."""
    hashes = (
        df.select(*keys, kmv_hash(F.col(col), seed).alias("__h"))
        .where(F.col("__h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(*[F.col(c) for c in keys]).orderBy("__h")
    state = (
        hashes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list("__h")).alias("kmv"))
    )
    return state.withColumn("estimate", kmv_estimate(F.col("kmv"), k))


# ------------------------------------------------------------ set operations

def _norm(h: Column) -> Column:
    """Signed-long hash → uniform (0, 1): h/2^64 + 1/2."""
    return h.cast("double") / F.lit(_TWO_64) + F.lit(0.5)


def kmv_theta(state: Column, k: int = DEFAULT_K) -> Column:
    """The state's theta: 1.0 while under-full (exact mode), else the
    normalized k-th minimum — the sampling threshold all retained hashes
    lie strictly below."""
    return F.when(F.size(state) < k, F.lit(1.0)).otherwise(
        _norm(F.element_at(state, k))
    )


def to_setop_sketch(state: Column, k: int = DEFAULT_K) -> Column:
    """Lift an ``array<long>`` KMV state into the composable set-op form
    ``struct<theta double, hashes array<long>>`` with hashes strictly
    below theta. The unified estimator is then ``size(hashes) / theta``
    for EVERY sketch — base or set-op result (for a full KMV state the
    k-1 values below the k-th minimum give exactly the classic
    (k-1)/theta)."""
    theta = kmv_theta(state, k)
    hashes = F.filter(state, lambda h: _norm(h) < theta)
    return F.struct(theta.alias("theta"), hashes.alias("hashes"))


def kmv_setop(func: str, a: Column, b: Column, k: int = DEFAULT_K) -> Column:
    """Druid's ``thetaSketchSetOp`` over two set-op sketches (lift raw
    ``array<long>`` KMV states with ``to_setop_sketch`` first): returns a
    set-op struct, so ops COMPOSE exactly like the DataSketches ones.
    theta' = min(theta_a, theta_b); both hash sets are re-filtered below
    theta' and combined:

    - UNION:     distinct(a ∪ b) below theta'
    - INTERSECT: a ∩ b below theta'
    - NOT:       a \\ b below theta' (every a-hash below theta' that IS in
                 b must appear in b's retained set, since theta' ≤
                 theta_b — so array_except is exact, not approximate)

    All expressions; estimate with ``kmv_setop_estimate``. Correctness of
    each op follows from theta sketches being uniform samples below
    theta: the result is precisely the sample of the set-expression
    below theta'.
    """
    ops = {
        "UNION": lambda x, y: F.array_distinct(F.concat(x, y)),
        "INTERSECT": F.array_intersect,
        "NOT": F.array_except,
    }
    if func not in ops:
        raise ValueError(
            f"kmv_setop: func must be one of {sorted(ops)}: {func!r}"
        )
    theta = F.least(a["theta"], b["theta"])
    ha = F.filter(a["hashes"], lambda h: _norm(h) < theta)
    hb = F.filter(b["hashes"], lambda h: _norm(h) < theta)
    hashes = F.array_sort(ops[func](ha, hb))
    return F.struct(theta.alias("theta"), hashes.alias("hashes"))


def kmv_setop_estimate(sketch: Column) -> Column:
    """Distinct estimate of a set-op sketch: ``size(hashes) / theta``
    (exact when theta == 1.0 — which the oracle exploits: with k at or
    above every branch's cardinality, INTERSECT/NOT/UNION are exact set
    algebra over the full hash sets)."""
    return F.size(sketch["hashes"]).cast("double") / sketch["theta"]
