"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windowed/session aggregations can't express —
here, lifetime running totals per key emitted on every update — the
pattern is: group the stream by key, keep a small numeric state per key in
the state store, fold each micro-batch's Arrow batches into it, emit the
updated row. State is O(keys), checkpointed, and survives restarts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key lifetime (count, total) updated each micro-batch.

    Works on a streaming DataFrame grouped by ``key_col``; emit mode is
    'update' (one row per key per batch in which it changed).
    """
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("n_events", LongType()),
            StructField("total", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    def update(
        key, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame([{"key": str(key[0]), "n_events": n, "total": s}])

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )
