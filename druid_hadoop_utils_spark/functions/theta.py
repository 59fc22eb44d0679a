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
