"""Z-order (Morton) clustering for segment layout.

Parquet prunes row groups by min/max stats, which only works for columns
the data is physically clustered on. The segment layout already clusters
time (one file tree per interval); a Z-order sort adds multi-column
clustering — bit-interleaving per-column codes so rows close in EVERY
keyed dimension land close in the file — the Spark-native analogue of
Druid's secondary partitioning (reference
DruidStorage.java's dimension-ordered segments), and the same technique
Delta/Iceberg expose as OPTIMIZE ZORDER BY.

All of it is Catalyst expressions: per-column codes are width_bucket /
hash built-ins, the interleave is a fixed tree of shifts and ORs, and the
layout is repartitionByRange + sortWithinPartitions on the z key — one
range shuffle, no UDFs, no collect beyond one bounded min/max aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_ZORDER_COLS = 4


def _column_code(df: DataFrame, col: str, bits: int) -> Column:
    """Map a column to a ``bits``-bit code preserving order for numerics
    and timestamps (width_bucket over the observed min/max — one bounded
    driver aggregate) and grouping equal values for strings (hash)."""
    dtype = dict(df.dtypes)[col]
    n = 1 << bits
    c = F.col(col)
    if dtype.startswith("timestamp"):
        c = c.cast("long")
        dtype = "bigint"
    if dtype in ("string", "binary"):
        return F.pmod(F.xxhash64(c), F.lit(n)).cast("long")
    row = df.agg(
        F.min(c).alias("lo"), F.max(c).alias("hi")
    ).first()
    lo, hi = row["lo"], row["hi"]
    if lo is None or hi is None or lo == hi:
        return F.lit(0).cast("long")
    # width_bucket returns 1..n+1 over [lo, hi); clamp into 0..n-1
    b = F.width_bucket(c.cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(n))
    code = F.least(F.greatest(b - 1, F.lit(0)), F.lit(n - 1))
    return F.coalesce(code, F.lit(0)).cast("long")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """The Morton key: per-column ``bits``-bit codes, bit-interleaved into
    one long (column j contributes bit i to z-bit ``i*k + j``). A fixed
    ``bits × k`` shift/OR expression tree — whole-stage codegen, no UDF."""
    k = len(cols)
    if not 1 <= k <= MAX_ZORDER_COLS:
        raise ValueError(
            f"zorder_key: need 1..{MAX_ZORDER_COLS} columns, got {k}"
        )
    if bits * k > 60:
        raise ValueError(
            f"zorder_key: bits={bits} × {k} cols exceeds the 60-bit budget"
        )
    codes = [_column_code(df, c, bits) for c in cols]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, code in enumerate(codes):
            z = z.bitwiseOR(
                F.shiftleft(code.bitwiseAND(F.lit(1 << i)), i * (k - 1) + j)
            )
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    num_partitions: int | None = None,
) -> DataFrame:
    """Re-cluster ``df`` on the Z-curve of ``cols``: one range shuffle on
    the Morton key, rows sorted by it within each partition, key dropped
    (a projection never reorders rows). Write the result and every keyed
    column's parquet min/max stats become selective — filters on ANY
    subset of ``cols`` skip row groups, not just the leading sort column
    of a lexicographic sort."""
    z = zorder_key(df, cols, bits)
    tagged = df.withColumn("__zorder", z)
    parts = [F.col("__zorder")]
    ranged = (
        tagged.repartitionByRange(num_partitions, *parts)
        if num_partitions
        else tagged.repartitionByRange(*parts)
    )
    return ranged.sortWithinPartitions("__zorder").drop("__zorder")
