"""Frequent-items (heavy hitters) at training-pipeline scale.

The naive ``groupBy(key).count().filter(cnt >= T)`` shuffles one row per
distinct key — at 100 TB with billions of distinct keys that shuffle IS
the job, even though only a handful of keys matter. ``heavy_hitters``
instead runs the classic two-pass scheme:

1. **Candidate generation** — a per-partition mergeable Misra-Gries
   summary (Agarwal et al., "Mergeable Summaries", PODS'12) with ``k``
   counters, built Arrow-batch-at-a-time inside ``mapInPandas``. Each
   partition emits at most ``k`` candidate keys, so the candidate set is
   ≤ k × numPartitions rows regardless of how many distinct keys exist.
   Guarantee: any key with global share ≥ 1/(k+1) of its partition's rows
   survives locally, and a key with global share ≥ θ must have local
   share ≥ θ in at least one partition (weighted-average pigeonhole), so
   with ``k >= ceil(1/θ)`` the candidate set is a provable superset of
   every θ-heavy hitter. No randomness, no misses.
2. **Exact verify** — a second scan counts ONLY the candidates (broadcast
   left-semi join, then one hash aggregate over ≤ k × P keys) and filters
   by the exact threshold. Output is therefore exactly the true heavy
   hitters with exact counts — deterministic and oracle-checkable.

Cost model: two scans of the input (cache/persist upstream if the input
is itself expensive), one tiny shuffle (candidates distinct), one bounded
hash aggregate. Nothing driver-side except Spark's own planning.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _misra_gries_partition(key_names: list[str], k: int):
    """Build the mapInPandas function: one mergeable MG summary per
    partition, emitted as candidate key rows when the partition ends."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[tuple, int] = {}
        for batch in batches:
            # count the batch vectorized, then merge into the running
            # summary (MG merge: add, then trim to k by subtracting the
            # (k+1)-th largest counter and dropping non-positive ones)
            vc = batch.groupby(key_names, dropna=False, sort=False).size()
            for key, n in vc.items():
                key_t = key if isinstance(key, tuple) else (key,)
                counters[key_t] = counters.get(key_t, 0) + int(n)
            if len(counters) > k:
                vals = sorted(counters.values(), reverse=True)
                cut = vals[k]  # (k+1)-th largest
                counters = {
                    key: c - cut for key, c in counters.items() if c > cut
                }
        if counters:
            yield pd.DataFrame(
                [list(key) for key in counters], columns=key_names
            )

    return summarize


def heavy_hitters(
    df: DataFrame,
    keys: str | list[str],
    min_share: float | None = None,
    min_count: int | None = None,
    k: int | None = None,
    count_col: str = "cnt",
) -> DataFrame:
    """Exact frequent items of ``keys``: all key tuples whose row count is
    ``>= min_share * total_rows`` (or ``>= min_count``), with exact counts.

    ``k`` is the Misra-Gries width (candidate-set bound per partition).
    For ``min_share`` it defaults to ``2 * ceil(1/min_share)`` — the
    factor-2 slack keeps candidates safe even when batches straddle the
    guarantee boundary exactly. For ``min_count`` the equivalent share is
    ``min_count / total_rows``, so the total is counted eagerly first (one
    extra scan, documented) and ``k`` is sized from it; if that would need
    more than ``max_k=1_000_000`` counters the threshold is so low that
    the problem IS the full groupBy — the function raises and tells the
    caller to use ``groupBy().count()`` directly.
    """
    if isinstance(keys, str):
        keys = [keys]
    if (min_share is None) == (min_count is None):
        raise ValueError("pass exactly one of min_share / min_count")
    if min_count is not None:
        # eager total: converts the absolute threshold into a share with a
        # provable candidate guarantee
        total_rows = df.count()
        min_share = min_count / max(total_rows, 1)
    if not (0 < min_share <= 1):
        raise ValueError(f"min_share must be in (0, 1]: {min_share}")
    if k is None:
        k = 2 * math.ceil(1 / min_share)
        if k > 1_000_000:
            raise ValueError(
                f"threshold share {min_share:.2e} needs k={k} Misra-Gries "
                "counters per partition — at that selectivity a plain "
                "groupBy().count() shuffle is the right plan"
            )

    # null-keyed rows are excluded (joins don't match null keys, and a
    # null "heavy hitter" is a data-quality signal, not a frequent item)
    keyed = df.select(*keys).na.drop(subset=keys)
    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in keyed.schema.fields
    )
    candidates = (
        keyed.mapInPandas(_misra_gries_partition(keys, k), schema=schema)
        .dropDuplicates(keys)
    )

    # exact verify: count only candidate keys (broadcast semi-join keeps
    # the scan map-side; the aggregate is over <= k * numPartitions keys)
    counted = (
        keyed.join(F.broadcast(candidates), on=keys, how="left_semi")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    if min_count is not None:
        return counted.where(F.col(count_col) >= int(min_count))
    total = keyed.agg(F.count(F.lit(1)).alias("__total"))
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col(count_col) >= F.lit(float(min_share)) * F.col("__total"))
        .drop("__total")
    )
