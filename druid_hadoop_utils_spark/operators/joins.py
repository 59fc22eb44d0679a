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
