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
    sides, union them, and carry each right column forward with
    ``last(..., ignorenulls)`` over (keys ORDER BY on, side) — a right row
    at the exact left timestamp wins (<= semantics). ONE shuffle on the
    keys, no range-condition nested-loop join, no right-side broadcast
    requirement: both sides can be arbitrarily large.
    """
    from pyspark.sql import Window

    rcols = right_cols or [c for c in right.columns if c != on and c not in keys]
    out_names = {c: f"{c}{suffix}" for c in rcols}
    clash = [out_names[c] for c in rcols if out_names[c] in left.columns]
    if clash:
        raise ValueError(f"right columns collide with left: {clash}; pass suffix=")

    r = right.select(
        *keys, F.col(on),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
    ).withColumn("__side", F.lit(0))
    l = left.withColumn("__side", F.lit(1))
    for c in rcols:
        l = l.withColumn(f"__r_{c}", F.lit(None))
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(on), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in rcols:
        unioned = unioned.withColumn(
            out_names[c], F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    return (
        unioned.where(F.col("__side") == 1)
        .drop("__side", *[f"__r_{c}" for c in rcols])
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
