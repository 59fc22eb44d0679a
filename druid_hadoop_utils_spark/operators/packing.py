"""Sequence packing: assign documents to fixed-token-budget packs.

Training pipelines concatenate documents into fixed-size sequences
("packing"); the assignment step needs to be DETERMINISTIC (re-runs build
identical packs), LAYOUT-INDEPENDENT, and computable without a
single-partition global window. The semantics here are budget-quantized
sequential packing: documents take a deterministic global order (hash
order), sizes cumulative-sum along it, and

    pack_id = floor((cumsum − size) / budget)

i.e. a document starts a new pack exactly when the running total crosses a
budget boundary. Every pack holds consecutive documents in hash order and
its total is < budget + max_document_size (the standard streaming
next-fit bound); the whole assignment is recomputable in ANSI SQL with
one window, which is what makes it oracle-checkable.

Scale shape — the classic DISTRIBUTED PREFIX SUM, because a global
cumulative window in Spark would collapse to a single partition:

1. each row gets a deterministic hash bucket (the coarse order);
2. one small aggregate computes per-bucket size totals (≤ n_buckets rows
   to the driver — bounded, documented);
3. running offsets per bucket broadcast back as a tiny join;
4. the cumulative window runs PER BUCKET (parallel across buckets) and
   adds the bucket's offset — an exact global cumsum with no global sort
   and no single-partition stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators.sampling import sample_bucket

DEFAULT_BUCKETS = 256


def pack_documents(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    group_cols: list[str] | None = None,
    seed: str = "s0",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Adds ``pack_id`` (long, 0-based) and ``pack_pos`` (cumulative size
    within the global order) to ``df``. Rows with null or non-positive
    ``size_col`` are dropped (a document with no tokens packs nowhere).

    With ``group_cols`` the packing restarts per group (e.g. one pack
    stream per language) and the prefix-sum buckets nest inside the
    groups.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive: {n_buckets}")
    gcols = list(group_cols or [])
    size = F.col(size_col).cast("long")
    bucket = F.pmod(sample_bucket(F.col(id_col), seed), F.lit(n_buckets))
    rows = df.where(size.isNotNull() & (size > 0)).withColumn("__bkt", bucket)

    # per-(group,)bucket totals -> running offsets (tiny: ≤ groups×buckets)
    from druid_hadoop_utils_spark.operators.sampling import (
        bucket_prefix_offsets,
    )

    totals = bucket_prefix_offsets(rows, gcols, "__bkt", F.sum(size))

    w = Window.partitionBy(*gcols, "__bkt").orderBy(
        sample_bucket(F.col(id_col), seed), F.col(id_col)
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        rows.join(F.broadcast(totals), gcols + ["__bkt"])
        .withColumn("__cum", F.sum(size).over(w) + F.col("__off"))
        .withColumn(
            "pack_id", F.floor((F.col("__cum") - size) / F.lit(budget))
        )
        .withColumn("pack_pos", F.col("__cum"))
        .drop("__bkt", "__off", "__cum")
    )


def pack_stats(
    packed: DataFrame,
    size_col: str,
    budget: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-pack fill statistics (docs, total size, fill ratio) — the
    packing-efficiency readout a pipeline monitors."""
    gcols = list(group_cols or [])
    return (
        packed.groupBy(*gcols, "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(size_col).cast("long")).alias("total_size"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("total_size") / F.lit(float(budget)), 4),
        )
    )
