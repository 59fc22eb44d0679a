"""Text-analysis operators for large-scale training-data pipelines.

All expressions are built-in Catalyst functions (split/regexp/transform/
aggregate) — no Python UDFs — so they run inside whole-stage codegen and
scale linearly with no shuffle except where aggregation is explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# deliberately small, auditable stopword sets for the n-gram/stopword
# language heuristic (public common-word lists)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """A BPE-flavored token estimate: word pieces + digits + punctuation
    each count, long words count once per ~4 chars (the common BPE rule of
    thumb), all via one regex extraction — no tokenizer library needed."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(F.lower(c), F.lit(r"[a-z]{1,4}|[0-9]|[^a-z0-9\s]"), F.lit(0))
    return F.size(pieces)


def fingerprint(col: Column | str) -> Column:
    """Key-collapsing document fingerprint: md5 over the sorted distinct
    token set (classic "fingerprint" clustering key). Deterministic and
    engine-portable (same value in DuckDB for the oracle)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def winnowing_fingerprints(
    col: Column | str, k: int = 8, window: int = 4
) -> Column:
    """Rolling-hash document fingerprints via winnowing (Schleimer/
    Wilkerson/Aiken's MOSS algorithm): hash every character k-gram of the
    normalized text, slide a window of ``window`` consecutive hashes, keep
    each window's minimum, return the sorted distinct selections.

    The winnowing guarantee: any shared substring of length k+window-1
    between two documents yields at least one shared fingerprint, so
    near-duplicates overlap heavily while edits only perturb fingerprints
    within ``window`` positions of the change. Pure Catalyst (substring /
    transform / slice / array_min — no UDF), and the hash is the
    engine-portable md5-prefix integer so the DuckDB oracle computes the
    identical value."""
    from functools import reduce

    c = normalize_text(col)
    num_grams = F.greatest(F.length(c) - (k - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), num_grams),
        lambda i: F.conv(F.substring(F.md5(F.substring(c, i, k)), 1, 15),
                         16, 10).cast("long"),
    )
    # window minima as an element-wise least() over `window` shifted
    # slices, combined with a zip_with reduce-tree. Each slice evaluates
    # `hashes` ONCE per row (HOF arguments are evaluated once; expressions
    # referenced INSIDE a lambda re-evaluate per element, which made the
    # previous transform-over-positions formulation O(n²) per document).
    # zip_with pads the shorter shifted slices with null and least()
    # ignores nulls, which exactly reproduces the "min of whatever fits"
    # edge semantics of the SQL twin for texts shorter than k + window - 1.
    num_windows = F.greatest(num_grams - (window - 1), F.lit(1))
    shifted = [F.slice(hashes, j + 1, num_windows) for j in range(window)]
    mins = reduce(
        lambda a, b: F.zip_with(a, b, lambda x, y: F.least(x, y)), shifted
    )
    return F.array_sort(F.array_distinct(mins))


def normalize_text(col: Column | str) -> Column:
    """Canonical cleaning for dedup/fingerprinting: lowercase, strip
    control characters, collapse runs of whitespace, trim. Pure regexp —
    identical semantics are expressible in the DuckDB oracle."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(c), r"[\x00-\x1f]", " ")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def repetition_ratio(col: Column | str) -> Column:
    """Share of tokens that are repeats of an earlier token (1 - distinct/
    total) — high values flag boilerplate/spam for quality filtering."""
    toks = tokens(col)
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks), 4
    )


def quality_features(col: Column | str) -> dict[str, Column]:
    """Cheap quality-scoring features: length, token stats, symbol ratios."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(col)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.round(
            F.length(F.regexp_replace(c, r"\s+", "")) / n_tokens, 4
        ),
        "nonalpha_ratio": F.round(
            F.length(F.regexp_replace(F.lower(c), r"[a-z0-9\s]", "")) / n_chars, 4
        ),
        "digit_ratio": F.round(
            F.length(F.regexp_replace(c, r"[^0-9]", "")) / n_chars, 4
        ),
    }


def quality_score(col: Column | str, min_tokens: int = 10, max_tokens: int = 100000,
                  max_nonalpha: float = 0.2) -> Column:
    """1/0 keep-signal from the heuristic features (Gopher-style gates)."""
    f = quality_features(col)
    return (
        (f["n_tokens"] >= min_tokens)
        & (f["n_tokens"] <= max_tokens)
        & (f["nonalpha_ratio"] <= max_nonalpha)
    ).cast("int")


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the n-gram-heuristic language ID)."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        pattern = r"\b(" + "|".join(words) + r")\b"
        out[lang] = F.size(F.regexp_extract_all(lowered, F.lit(pattern), F.lit(0)))
    return out


def lang_id(col: Column | str, default: str = "und") -> Column:
    """Predicted language = argmax of stopword scores, ties broken by the
    fixed key order of LANG_STOPWORDS; 'und' when nothing matches.

    A CJK heuristic runs first: any CJK codepoints → 'zh' (whitespace
    stopwords can't see ideographs)."""
    scores = lang_scores(col)
    c = F.col(col) if isinstance(col, str) else col
    langs = list(scores)
    total = None
    for s in scores.values():
        total = s if total is None else total + s
    expr = F.when(c.rlike(r"[一-鿿]"), F.lit("zh")).when(total == 0, F.lit(default))
    remaining = list(langs)
    for lang in langs[:-1]:
        remaining.remove(lang)
        rest = [scores[o] for o in remaining]
        best_rest = rest[0] if len(rest) == 1 else F.greatest(*rest)
        expr = expr.when(scores[lang] >= best_rest, F.lit(lang))
    return expr.otherwise(F.lit(langs[-1]))


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: (id, term, score).

    score = tf × ln(N / df), ranked per document (ties broken by term).
    Plan shape: explode tokens → (doc, term) hash-aggregate for tf → one
    more aggregate for document frequencies → join back (df table is
    term-cardinality sized — broadcastable) → per-doc window top-k. The
    corpus size N enters as a broadcast one-row cross join, so the whole
    thing is a single declarative plan — no driver-side count action.

    r15: the (doc, term, tf) postings frame is materialized via
    ``materialize_shared`` — it feeds both the document-frequency
    aggregate and the scoring join, and Catalyst duplicated the scan +
    tokenization + tf aggregate per consumer (two full tokenization
    passes in the audit plan); below the size gate (operators/
    shared.py) the duplicate pass is cheaper than the materialization
    job and the frame is left inline. N still scans the base frame
    (column-pruned to the id): a document with no tokens counts toward
    N but has no postings row, so N cannot be derived from the postings
    without changing scores."""
    from pyspark.sql import Window

    from druid_hadoop_utils_spark.operators.shared import materialize_shared

    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = materialize_shared(
        toks.groupBy(id_col, "term").agg(F.count("*").alias("tf")),
        site="text.tfidf_top_terms",
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    if min_df > 1:
        dfreq = dfreq.where(F.col("df") >= min_df)
    n_docs = df.select(F.count_distinct(F.col(id_col)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col), "term",
            (F.col("tf") * F.log(F.col("__n") / F.col("df"))).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.col("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-token-count chunks with overlap —
    (id, chunk_id, chunk_text, n_tokens) — the standard pre-tokenization
    step for training/embedding pipelines.

    Pure expressions: tokenization, a ``sequence`` of chunk starts
    (stride = chunk_tokens - overlap), ``posexplode``, and a token-slice
    rejoin. One generator per row, no shuffle, no UDFs; output rows carry
    only their chunk text, so a 100 TB corpus never duplicates whole
    documents."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)),
                        F.lit(stride))
    return (
        df.select(F.col(id_col), toks.alias("__toks"),
                  F.posexplode(starts).alias("chunk_id", "__start"))
        .select(
            id_col,
            "chunk_id",
            F.concat_ws(
                " ", F.slice(F.col("__toks"), F.col("__start"), chunk_tokens)
            ).alias("chunk_text"),
            F.least(
                F.lit(chunk_tokens),
                F.size(F.col("__toks")) - F.col("__start") + 1,
            ).alias("n_tokens"),
        )
    )


# PII-ish scrubbing rules, applied in order (URLs before emails so an
# address inside a URL is swallowed by <URL>; long digit runs last). The
# regexes stay inside the syntax subset that Java regex (Spark) and RE2
# (DuckDB and most external validators) interpret identically: character
# classes, +, {m,}, alternation — no backrefs, no lookaround.
REDACTION_RULES: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("number", r"[0-9]{7,}", "<NUMBER>"),
]


def redact_text(
    col: Column | str, rules: list[tuple[str, str, str]] | None = None
) -> Column:
    """Scrub PII-ish spans (URLs, emails, long digit runs by default) with
    typed placeholders — the standard pre-release pass over a training
    corpus. A chain of builtin ``regexp_replace`` calls: whole-stage
    codegen, no UDFs, no shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pattern, placeholder in rules or REDACTION_RULES:
        c = F.regexp_replace(c, pattern, placeholder)
    return c


def redaction_counts(
    col: Column | str, rules: list[tuple[str, str, str]] | None = None
) -> dict[str, Column]:
    """Per-rule match counts over the RAW text (audit metric for a
    redaction run). Counted before any replacement, so rule order does not
    affect the numbers."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.regexp_count(c, F.lit(pattern))
        for name, pattern, _ in rules or REDACTION_RULES
    }


def contamination_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
    train_split: str = "train",
    test_split: str = "test",
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_fp_docs: int | None = 10_000,
) -> DataFrame:
    """Train/test contamination check: pairs of (train doc, test doc)
    sharing at least ``min_shared`` winnowing fingerprints — the standard
    benchmark-leakage sweep a training pipeline runs before a data release.

    Pipeline (all DataFrame ops, one fingerprint computation):
    1. explode each document's winnowing fingerprints (k-gram rolling
       hash + window minima — any shared substring of length k+window-1
       guarantees a shared fingerprint);
    2. drop ubiquitous fingerprints appearing in more than ``max_fp_docs``
       documents (boilerplate — same role as the LSH hot-bucket cap: keeps
       the fingerprint join's candidate volume linear at 100 TB; ``None``
       disables for exact oracle runs);
    3. join train-side to test-side on fingerprint and count shared prints
       per (train_id, test_id).

    Shuffles: one on fingerprint (the cap's groupBy partitions on the same
    key the join needs, so AQE reuses the exchange) and one on the pair
    key for the final count. No driver-side state.
    """
    from druid_hadoop_utils_spark.operators.dedup import spread

    # spread: the per-document winnowing is the CPU-heavy stage — a small
    # parquet file would otherwise plan as one input partition and run the
    # whole corpus on a single core. The fingerprint frame then feeds
    # three consumers (the cap, the train side, the test side) — a
    # tracked persist() (operators/shared.py generation ledger, r16)
    # materializes it once instead of re-running the winnowing
    # expression per branch; lineage stays intact for executor-loss
    # recovery, and the next invocation releases this generation
    # deterministically (no session-lifetime cache pin)
    from druid_hadoop_utils_spark.operators.shared import persist_shared

    fps = persist_shared(
        spread(df.select(id_col, split_col, text_col)).select(
            F.col(id_col),
            F.col(split_col),
            F.explode(
                winnowing_fingerprints(text_col, k=k, window=window)
            ).alias("fp"),
        ),
        "text.leakage_safe_split",
    )
    if max_fp_docs is not None:
        # fingerprints are distinct per document, so count(*) == doc count
        keep = (
            fps.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__docs"))
            .where(F.col("__docs") <= int(max_fp_docs))
            .select("fp")
        )
        fps = fps.join(keep, "fp", "left_semi")
    train = fps.where(F.col(split_col) == train_split).select(
        F.col(id_col).alias("train_id"), "fp"
    )
    test = fps.where(F.col(split_col) == test_split).select(
        F.col(id_col).alias("test_id"), "fp"
    )
    return (
        train.join(test, "fp")
        .groupBy("train_id", "test_id")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= int(min_shared))
    )


def with_text_analysis(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the full text-analysis feature set."""
    feats = quality_features(text_col)
    return df.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        fingerprint(text_col).alias("fingerprint"),
        lang_id(text_col).alias("pred_lang"),
        quality_score(text_col).alias("quality_keep"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["nonalpha_ratio"].alias("nonalpha_ratio"),
    )


def bigrams(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """Per-document token bigrams as (id, prev, cur) rows. The pairing is
    a single codegen expression — transform over the sliced token array,
    no window, no per-doc shuffle — then one explode. Documents with
    fewer than two tokens contribute nothing."""
    t = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    pairs = F.expr(
        "transform(slice(__toks, 1, size(__toks) - 1), "
        "(x, i) -> struct(x AS prev, __toks[i + 1] AS cur))"
    )
    return (
        t.where(F.size("__toks") >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("__bg"))
        .select(F.col(id_col), F.col("__bg.prev").alias("prev"),
                F.col("__bg.cur").alias("cur"))
    )


def lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Corpus-trained bigram language-model score per document — the
    classic "perplexity filter" of training-data pipelines (docs whose
    token transitions are improbable under the corpus' own statistics are
    boilerplate, gibberish, or the wrong language), without any external
    LM: the corpus is its own model.

    Model: additive-smoothing bigram LM trained on the full input.
    score(doc) = mean over its bigrams of
    ``ln((c(prev,cur) + alpha) / (c(prev) + alpha·V))`` where V is the
    context vocabulary size. Higher (less negative) = more typical text.

    Plan shape at scale: bigram counts are ONE two-phase hash aggregate on
    (prev, cur); context counts aggregate FROM the bigram counts (never a
    second pass over the data); the count tables join each other on prev
    (both ≈ vocabulary-sized), and the doc bigram stream meets the merged
    counts in ONE shuffle join on (prev, cur). The vocabulary scalar is a
    1-row broadcast. Returns (id, n_bigrams, avg_logp).

    The bigram-count MODEL table (``cbg``) is materialized once via
    ``materialize_shared``: it feeds three plan branches (context
    counts, the vocabulary scalar, and the scoring join), and without
    the materialization Catalyst re-runs the full corpus bigram
    extraction + aggregation once per branch (the r14 plan carried four
    document scans). The materialized table is model-sized — distinct
    bigrams, never corpus tokens — the same volume class the join
    already broadcasts. Below the size gate (operators/shared.py) the
    re-aggregation is cheaper than the materialization job and the
    model stays inline (measured +0.3 s from unconditional
    materialization on the sf0.1 bench — the gate is exactly the
    local-vs-scale crossover this module documents).
    """
    if alpha <= 0:
        raise ValueError(f"lm_score: alpha must be positive: {alpha}")
    from druid_hadoop_utils_spark.operators.shared import materialize_shared

    bg = bigrams(df, id_col, text_col)
    cbg = materialize_shared(
        bg.groupBy("prev", "cur").agg(F.count("*").alias("__cbg")),
        site="text.lm_score",
    )
    cctx = cbg.groupBy("prev").agg(F.sum("__cbg").alias("__cctx"))
    vocab = cctx.agg(F.count("*").alias("__v"))
    counts = cbg.join(cctx, "prev")
    logp = F.log(
        (F.col("__cbg") + F.lit(alpha))
        / (F.col("__cctx") + F.lit(alpha) * F.col("__v"))
    )
    return (
        bg.join(counts, ["prev", "cur"])
        .join(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(logp), 4).alias("avg_logp"),
        )
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    max_size: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Corpus token vocabulary: (token, count, token_id) with ids dense
    from 0 in (count DESC, token ASC) order — frequent tokens get small
    ids, ties broken lexically so the vocabulary is deterministic and
    layout-independent.

    One explode + one hash aggregate (map-side combined); the id
    assignment is a window over the AGGREGATED vocabulary — rows =
    distinct tokens, not corpus tokens, so the single-partition rank pass
    handles real vocabularies (≤ a few million rows) comfortably; corpora
    whose distinct-token table itself outgrows one task should cut with
    ``min_count`` first. ``max_size`` keeps the top-N; ``min_count``
    drops the long tail (the standard OOV cut).
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("count"))
        .where(F.col("count") >= min_count)
    )
    w = Window.orderBy(F.desc("count"), F.col("token"))
    out = counts.withColumn("token_id", F.row_number().over(w) - 1)
    if max_size is not None:
        out = out.where(F.col("token_id") < max_size)
    return out


def encode_documents(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
) -> DataFrame:
    """Encode each document as its token-id sequence (order preserved):
    (id, input_ids array<int>, n_tokens) — the tokenize-and-encode step
    before packing/batching.

    Positional explode → broadcast-or-hash join on the token (Catalyst
    picks broadcast while the vocabulary fits, the common case) →
    re-assemble sorted by position. Out-of-vocabulary tokens encode as
    ``oov_id``. Two shuffles at scale: the token join and the per-doc
    re-assembly; the token stream never routes through Python.
    """
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("__pos", "token"),
    ).where(F.col("token") != "")
    joined = toks.join(
        vocab.select("token", "token_id"), "token", "left"
    ).withColumn(
        "__id", F.coalesce(F.col("token_id"), F.lit(oov_id)).cast("int")
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__id")))
                ),
                lambda s: s["__id"],
            ).alias("input_ids")
        )
        .withColumn("n_tokens", F.size("input_ids"))
    )


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document vocabulary coverage: (id, n_tokens, n_oov, oov_rate)
    against a ``build_vocab`` table — the curation signal for sizing a
    tokenizer vocabulary (documents with high OOV under the candidate
    vocab are the ones a byte-fallback tokenizer will fragment).

    One positional explode + one left join on the token (Catalyst
    broadcasts the vocab while it fits) + one per-doc aggregate; the
    token stream never routes through Python. Empty/whitespace-only
    documents drop out (no tokens — same convention as encode_documents).
    The vocab side is deduplicated defensively (``distinct`` on the
    token column — still broadcastable) so a caller passing a table with
    duplicate token rows can't fan the join out and inflate the counts.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(tokens(text_col)).alias("token"),
    ).where(F.col("token") != "")
    joined = toks.join(vocab.select("token").distinct().withColumn(
        "__in", F.lit(1)), "token", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
            .cast("long").alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.round(F.col("n_oov") / F.col("n_tokens"), 4),
        )
    )


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group corpus "data card": document count, total/median
    characters, and the exact-duplicate rate — the summary table a
    training-data release ships next to the corpus.

    Composition, one logical pass each: a hash aggregate for
    counts/volume/distinct fingerprints (md5 of the raw text — exact
    dups only; near-dup rates come from the dedup family), and the
    rank-quantile median over the collapsed (group, length) distribution
    (never a raw sort). Both shuffles key on the group columns.

    r15: the per-doc (group, length, fingerprint) frame is materialized
    via ``materialize_shared`` — it feeds both the stats aggregate and
    the median branch, and Catalyst duplicated the full text scan per
    consumer. The materialized frame is ~50 B/doc (the text itself
    never crosses), so one corpus read replaces two; below the size
    gate (operators/shared.py) the second read is cheaper than the
    materialization job and the frame is left inline."""
    from druid_hadoop_utils_spark.functions.quantiles import rank_quantiles
    from druid_hadoop_utils_spark.operators.shared import materialize_shared

    gcols = list(group_cols or [])
    lens = materialize_shared(
        df.select(
            *gcols,
            F.length(text_col).alias("__len"),
            F.md5(F.col(text_col).cast("binary")).alias("__fp"),
        ),
        site="text.corpus_report",
    )
    base = (lens.groupBy(*gcols) if gcols else lens.groupBy()).agg(
        F.count("*").alias("n_docs"),
        F.sum("__len").alias("total_chars"),
        F.count_distinct("__fp").alias("n_unique"),
    ).withColumn(
        "dup_rate",
        F.round((F.col("n_docs") - F.col("n_unique"))
                / F.col("n_docs"), 4),
    )
    med = rank_quantiles(lens, "__len", gcols, [0.5]) \
        .withColumnRenamed("p50", "median_chars")
    if gcols:
        return base.join(med, gcols)
    return base.join(med)
