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


def _ranged_expr(df: DataFrame, col: str) -> Column | None:
    """The orderable (numeric) expression for a column, or None when the
    column codes by hash (strings/binary group equal values instead)."""
    dtype = dict(df.dtypes)[col]
    if dtype.startswith("timestamp"):
        return F.col(col).cast("long")
    if dtype in ("string", "binary"):
        return None
    return F.col(col)


def _column_codes(df: DataFrame, cols: list[str], bits: int) -> list[Column]:
    """``bits``-bit codes per column: order-preserving width_bucket over
    the observed min/max for numerics/timestamps, hash for strings. ALL
    numeric bounds come from ONE aggregate job (a single bounded driver
    collect regardless of how many columns are keyed)."""
    n = 1 << bits
    ranged = {c: e for c in cols if (e := _ranged_expr(df, c)) is not None}
    bounds: dict[str, tuple] = {}
    if ranged:
        aggs = []
        for c, e in ranged.items():
            aggs += [F.min(e).alias(f"__lo_{c}"), F.max(e).alias(f"__hi_{c}")]
        row = df.agg(*aggs).first()
        bounds = {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in ranged}
    codes = []
    for c in cols:
        if c not in ranged:
            codes.append(F.pmod(F.xxhash64(F.col(c)), F.lit(n)).cast("long"))
            continue
        lo, hi = bounds[c]
        if lo is None or hi is None or lo == hi:
            codes.append(F.lit(0).cast("long"))
            continue
        # width_bucket returns 1..n+1 over [lo, hi); clamp into 0..n-1
        b = F.width_bucket(
            ranged[c].cast("double"), F.lit(float(lo)), F.lit(float(hi)), F.lit(n)
        )
        code = F.least(F.greatest(b - 1, F.lit(0)), F.lit(n - 1))
        codes.append(F.coalesce(code, F.lit(0)).cast("long"))
    return codes


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
    missing = [c for c in cols if c not in dict(df.dtypes)]
    if missing:
        raise ValueError(f"zorder_key: columns not in DataFrame: {missing}")
    codes = _column_codes(df, cols, bits)
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
