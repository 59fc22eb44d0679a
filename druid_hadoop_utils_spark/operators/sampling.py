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


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    group_cols: list[str] | None = None,
    seed: str = "s0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows (per group):
    Efraimidis–Spirakis A-ES with the deterministic hash as the RNG, so
    the sample is reproducible, layout-independent, and recomputable by
    the SQL oracle. P(row selected) scales with ``weight_col`` (rows with
    non-positive or null weight never qualify).

    Each row draws u = (bucket(id ‖ seed) + 0.5) / 1e6 ∈ (0, 1) and gets
    key = ln(u) / w — the log-space E-S key (u^(1/w) monotone) — and the
    k LARGEST keys win. Grouped: one shuffle on the group keys, then a
    row_number window. Global: sort-limit compiles to
    TakeOrderedAndProject (per-partition top-k + driver merge of k×P
    rows) — no single-partition window, no full sort at scale.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    u = (sample_bucket(F.col(id_col), seed) + F.lit(0.5)) / F.lit(float(_BUCKETS))
    w = F.col(weight_col).cast("double")
    key = F.log(u) / w
    scored = df.where(w > 0).withColumn("__esk", key)
    if group_cols:
        win = Window.partitionBy(*group_cols).orderBy(
            F.desc("__esk"), F.col(id_col)
        )
        return (
            scored.withColumn("__rn", F.row_number().over(win))
            .where(F.col("__rn") <= k)
            .drop("__esk", "__rn")
        )
    return scored.orderBy(F.desc("__esk"), F.col(id_col)).limit(k).drop("__esk")


def temperature_weights(
    counts: dict[str, int], temperature: float
) -> dict[str, float]:
    """Temperature-scaled mixture weights from raw source counts:
    ``w_s ∝ count_s^(1/T)`` (Conneau & Lample's multilingual sampling —
    T=1 keeps natural proportions, T→∞ approaches uniform, T in (1, 5]
    upsamples the tail without flattening the head).

    Returned UNNORMALIZED: ``mix_sources``'s keep counts
    (``floor(min_t(n_t/w_t) · w_s)``) are invariant to scaling every
    weight by a constant, and skipping the normalizing sum keeps the
    math a pure per-source expression — no float-summation-order
    dependence, so a SQL oracle recomputes it bit-identically. NOTE:
    T=2 makes the exponent 0.5, i.e. ``sqrt`` — exactly rounded under
    IEEE 754, identical in every engine; other exponents go through
    ``pow``, whose last-ulp behavior is libm-specific."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0: {temperature}")
    if not counts:
        raise ValueError("temperature_weights: need at least one source")
    import math

    if temperature == 2.0:
        return {s: math.sqrt(float(n)) for s, n in counts.items()}
    return {s: float(n) ** (1.0 / temperature) for s, n in counts.items()}


def mix_sources(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "s0",
    temperature: float | None = None,
) -> DataFrame:
    """Mixture-weighted downsampling: keep the LARGEST subset whose source
    composition matches the target ``weights`` — the data-mixing step of a
    training pipeline (e.g. 50% web / 30% code / 20% books from skewed
    raw pools).

    The binding source sets the scale: ``scale = min_s(count_s /
    weight_s)`` and each source keeps ``floor(scale × weight_s)`` rows —
    no source is oversampled (sampling is WITHOUT replacement), and the
    result is the provably largest weight-exact mixture. Row selection is
    the smallest hash buckets per source (row_number over the
    deterministic ``md5_60`` bucket), so the subset is reproducible,
    layout-independent, and SQL-recomputable.

    Plan shape: one count aggregate (collects ≤ #sources rows to the
    driver — bounded, documented), then one shuffle on the source key
    where WindowGroupLimit prunes each partition to its per-source keep
    count before the exchange. Sources absent from ``weights`` drop.
    """
    from pyspark.sql import Window

    if (weights is None) == (temperature is None):
        raise ValueError(
            "mix_sources: pass exactly one of weights= (explicit mixture) "
            "or temperature= (weights derived from source counts)"
        )
    counts: dict | None = None
    if temperature is not None:
        # the weights ARE a function of the data here: one bounded count
        # aggregate over ALL sources, reused below (no second count job)
        counts = {
            r[0]: r[1] for r in df.groupBy(source_col).count().collect()
            if r[0] is not None
        }
        weights = temperature_weights(counts, temperature)
    if not weights:
        raise ValueError("mix_sources: need at least one source weight")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive: {weights}")
    if counts is None:
        counts = {
            r[0]: r[1]
            for r in df.where(F.col(source_col).isin(*weights))
            .groupBy(source_col).count().collect()
        }
    missing = sorted(set(weights) - set(counts))
    if missing:
        raise ValueError(
            f"mix_sources: sources {missing} have no rows — drop them from "
            "weights or fix the source column"
        )
    scale = min(counts[s] / w for s, w in weights.items())
    keep = {s: int(scale * w) for s, w in weights.items()}
    keep_expr = None
    for s, n in keep.items():
        cond = F.col(source_col) == F.lit(s)
        keep_expr = F.when(cond, F.lit(n)) if keep_expr is None \
            else keep_expr.when(cond, F.lit(n))
    win = Window.partitionBy(source_col).orderBy(
        sample_bucket(F.col(id_col), seed), F.col(id_col)
    )
    return (
        df.where(F.col(source_col).isin(*weights))
        .withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") <= keep_expr)
        .drop("__rn")
    )


def leakage_safe_split(
    df: DataFrame,
    text_col: str,
    fractions: dict[str, float],
    seed: str = "s0",
    output: str = "split",
    key: Column | None = None,
) -> DataFrame:
    """Train/valid/test split that can never leak a duplicate across
    splits: the split is a pure function of the CONTENT key (default: the
    token-set fingerprint of ``text_col``), so byte-identical and
    token-identical documents always land in the same split — the
    leakage-safety property a per-row id split (``hash_split``) lacks.

    Still a map-side expression: no group-by, no join, no shuffle — group
    cohesion comes from hashing the group KEY itself rather than electing
    a representative. Pass ``key`` to use a stronger grouping column
    (e.g. a near-dup cluster id from ``dedup.cluster_near_dups``) when one
    is already materialized.
    """
    from druid_hadoop_utils_spark.operators.text import fingerprint

    k = key if key is not None else fingerprint(text_col)
    tagged = df.withColumn("__lsk", k)
    out = hash_split(tagged, "__lsk", fractions, seed=seed, output=output)
    return out.drop("__lsk")


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


def cap_per_group(
    df: DataFrame,
    id_col: str,
    group_cols: list[str],
    n: int,
    seed: str = "s0",
) -> DataFrame:
    """Per-group quota: keep at most ``n`` rows per group, chosen by the
    deterministic hash order (layout-independent, rerun-stable, nested —
    a larger ``n`` keeps a superset). The crawl-balancing step that stops
    one domain/source from dominating a corpus.

    One shuffle on the group key; Spark's WindowGroupLimit prunes each
    partition to its top-n BEFORE the exchange, so the shuffle moves at
    most n × partitions rows per group no matter how skewed the group is.
    """
    from pyspark.sql import Window

    if n <= 0:
        raise ValueError(f"cap_per_group: n must be positive: {n}")
    w = Window.partitionBy(*group_cols).orderBy(
        sample_bucket(F.col(id_col), seed), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def bucket_prefix_offsets(
    rows: DataFrame,
    group_cols: list[str],
    bucket_col: str,
    weight: Column,
) -> DataFrame:
    """Distributed-prefix-sum scaffolding shared by ``pack_documents``
    and ``deterministic_shuffle``: per-(group,)bucket totals of
    ``weight`` → running offsets in bucket order. Output is tiny
    (≤ groups × buckets rows) and broadcast back by callers; the offset
    window runs over that tiny frame only, never the data."""
    from pyspark.sql import Window

    return (
        rows.groupBy(*group_cols, bucket_col)
        .agg(weight.alias("__tot"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__tot").over(
                    Window.partitionBy(*group_cols).orderBy(bucket_col)
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .drop("__tot")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "s0",
    n_buckets: int = 256,
    n_shards: int | None = None,
) -> DataFrame:
    """Reproducible global corpus shuffle: adds ``shuffle_pos`` (0-based,
    a permutation of 0..n-1) ordering rows by the deterministic hash
    order (bucket, md5-hash, id) — the pre-sharding shuffle a training
    pipeline runs so adjacent raw documents (same crawl host, same dump
    file) land far apart, identically on every rerun and regardless of
    input partitioning. With ``n_shards``, also assigns round-robin
    ``shard_id`` = pos % n_shards and ``pos_in_shard`` = pos div
    n_shards — shards are size-balanced to ±1 row and each is itself in
    shuffled order.

    Scale shape: the classic distributed prefix sum over per-bucket
    COUNTS (same as ``pack_documents``): one small aggregate (≤
    n_buckets rows), broadcast offsets, rank windows run PER BUCKET in
    parallel — no global sort, no single-partition window. Requires
    unique ids (ties would make positions ambiguous); the whole order is
    ANSI-SQL-expressible, so an external oracle can recompute every
    position exactly.
    """
    from pyspark.sql import Window

    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive: {n_buckets}")
    if n_shards is not None and n_shards <= 0:
        raise ValueError(f"n_shards must be positive: {n_shards}")
    h = sample_bucket(F.col(id_col), seed)
    rows = df.withColumn("__h", h).withColumn(
        "__bkt", F.pmod(F.col("__h"), F.lit(n_buckets))
    )
    offsets = bucket_prefix_offsets(rows, [], "__bkt", F.count("*"))
    w = Window.partitionBy("__bkt").orderBy("__h", F.col(id_col))
    out = (
        rows.join(F.broadcast(offsets), "__bkt")
        .withColumn(
            "shuffle_pos",
            (F.row_number().over(w) - 1 + F.col("__off")).cast("long"),
        )
        .drop("__h", "__bkt", "__off")
    )
    if n_shards is not None:
        out = out.withColumn(
            "shard_id", F.pmod(F.col("shuffle_pos"), F.lit(n_shards))
        ).withColumn(
            "pos_in_shard", F.expr(f"shuffle_pos div {int(n_shards)}")
        )
    return out
