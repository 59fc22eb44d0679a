"""Deterministic hash-based sampling and splitting.

Training-data pipelines need samples that are REPRODUCIBLE (reruns pick
the same rows), LAYOUT-INDEPENDENT (repartitioning doesn't change the
sample), and JOIN-STABLE (the same id always lands in the same split so
features computed in different jobs line up). Random sampling
(``df.sample``) gives none of these across re-layouts; hashing the id
gives all three:

    keep(id) ⇔ bucket(id) < fraction × B,  bucket = hash(id ‖ seed) mod B

The hash is the engine's ``md5_60`` (operators/dedup.py) so every sampling
decision is reproducible in ANSI SQL by an external system — the same
property the SimHash oracle uses. All expressions, no shuffle: sampling is
a map-side filter; stratified fractions compile to one CASE over the
stratum column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators.dedup import md5_60

_BUCKETS = 1_000_000  # ppm resolution for fractions


def sample_bucket(col: Column, seed: str = "s0") -> Column:
    """Stable bucket in [0, 1e6): md5_60 of (value ‖ seed), nonneg mod."""
    return F.pmod(md5_60(F.concat(col.cast("string"), F.lit(seed))), F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame,
    id_col: str,
    fraction: float,
    seed: str = "s0",
) -> DataFrame:
    """Keep ~``fraction`` of rows, keyed on ``id_col`` — deterministic,
    layout-independent, rerun-stable. A map-side filter: no shuffle, no
    RNG state."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    return df.where(sample_bucket(F.col(id_col), seed) < int(fraction * _BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    seed: str = "s0",
    output: str = "split",
) -> DataFrame:
    """Disjoint named splits (e.g. {"train": .9, "valid": .05, "test":
    .05}) as a label column; every id deterministically lands in exactly
    one split. Fractions must sum to ≤ 1 (the remainder drops)."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = sample_bucket(F.col(id_col), seed)
    expr = None
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(frac * _BUCKETS)
        cond = (bucket >= lo) & (bucket < hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    out = df.withColumn(output, expr)
    return out.where(F.col(output).isNotNull())


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum sampling fractions (e.g. downsample boilerplate-heavy
    languages): one CASE expression over the stratum column — still a
    map-side filter, no shuffle, no per-stratum jobs."""
    bucket = sample_bucket(F.col(id_col), seed)
    threshold = None
    for value, frac in fractions.items():
        cond = F.col(stratum_col) == F.lit(value)
        lit = F.lit(int(frac * _BUCKETS))
        threshold = F.when(cond, lit) if threshold is None else threshold.when(cond, lit)
    threshold = (
        threshold.otherwise(F.lit(int(default_fraction * _BUCKETS)))
        if threshold is not None
        else F.lit(int(default_fraction * _BUCKETS))
    )
    return df.where(bucket < threshold)
