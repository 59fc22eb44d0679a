"""Full-text retrieval over the corpus: term statistics and BM25 ranking.

The training-data counterpart of Druid's ``search`` query (reference
exposes Druid search through the native-query JSON path — see
druid_hadoop_utils_spark/api.py): where Druid search matches dimension
values, a data pipeline needs relevance-ranked document retrieval for
curation, decontamination lookups, and eval-set mining.

Plan shape (scale notes):
- the per-(doc, term) frequency table is produced by ONE hash aggregate
  over exploded tokens, with the query-term filter applied BEFORE the
  shuffle — shuffle volume is proportional to matching tokens only;
- per-term document frequencies for scoring are bounded by the number of
  query terms (a handful of rows) and broadcast;
- corpus-level stats (N, avgdl) are a broadcast one-row aggregate — no
  driver-side count action;
- the final top-k is a TakeOrderedAndProject (no global sort).

Everything is built-in Catalyst expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators.text import tokens


def corpus_term_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", min_df: int = 1
) -> DataFrame:
    """Per-term corpus statistics — (term, df, total_tf) — the inverted-
    index vocabulary table. One explode + one hash aggregate; map-side
    partials keep the shuffle at term-cardinality."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    out = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("total_tf")
    )
    if min_df > 1:
        out = out.where(F.col("df") >= min_df)
    return out


def bm25_topk(
    df: DataFrame,
    query: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int | None = 6,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25
    (Robertson/Spärck Jones; the Lucene ``ln(1 + (N - df + .5)/(df + .5))``
    idf variant, which keeps idf positive for terms in >half the corpus).

    Returns (id, score) with a total order (score desc, id asc — ties
    deterministic). ``round_to`` rounds the score so the value is
    engine-portable for oracle comparison; pass ``None`` for raw doubles.

    Scale: the only wide exchange is the (doc, term) aggregate over
    tokens that match the query terms — the filter sits under the
    explode's projection, so a 100 TB corpus shuffles only matching
    postings. df/N/avgdl are broadcast. Top-k never global-sorts.

    Profiled alternatives (round 6, sf0.1, local[32], BENCH_r05's
    q_bm25_search watch item): (a) a zero-shuffle formulation computing
    per-term tf as size(filter(tokens)) expressions plus one 1-row
    stats aggregate measured 1.0-1.4 s vs 0.7-0.9 s for this plan —
    each tf expression re-tokenizes the text, and regexp tokenization
    dominates the runtime; (b) pre-filtering the array before explode
    (explode(filter(toks, isin))) measured within noise of this plan.
    The r4→r5 bench delta (0.62→1.05 s) does not reproduce quietly;
    this shape stands as the fastest measured.

    r15: the corpus is tokenized ONCE. The r14 plan had three consumers
    of the tokenized frame (corpus stats, the postings aggregate, and —
    through postings — the per-term document frequencies), and Catalyst
    duplicates the subtree per consumer: three full parquet scans, each
    re-running the regexp tokenization that dominates runtime
    (plans/r15/q_hybrid_search_before.txt). Now one pass projects
    (id, doc_len, query-term matches) — the matches array is bounded by
    query-term occurrences, thousands of times smaller than the token
    stream — and ``materialize_shared`` materializes it so every
    downstream branch reads the materialized blocks (below the size
    gate in operators/shared.py the per-branch re-scan of the tiny
    input is cheaper than the materialization job and the frame stays
    inline). Scoring math and row semantics are unchanged:
    explode(filter(toks, isin)) ≡ explode(toks) filtered, so tf/df/N
    and the final scores are bit-identical.
    """
    if not query:
        raise ValueError("bm25_topk: query must contain at least one term")
    from druid_hadoop_utils_spark.operators.shared import materialize_shared

    qterms = sorted({t.lower() for t in query})

    toks = tokens(text_col)
    matched = materialize_shared(
        df.select(
            F.col(id_col),
            F.size(toks).alias("__dl"),
            F.filter(toks, lambda t: t.isin(qterms)).alias("__mt"),
        ),
        site="search.bm25_topk",
    )
    # corpus stats: one broadcast row (from the materialized frame —
    # no second corpus scan)
    stats = matched.select(
        F.count("*").alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    # postings restricted to query terms BEFORE the (doc, term) shuffle
    postings = (
        matched.select(
            F.col(id_col), F.col("__dl"), F.explode("__mt").alias("term")
        )
        .groupBy(id_col, "__dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    # per-term document frequency — at most len(qterms) rows; broadcast
    dfreq = postings.groupBy("term").agg(F.count("*").alias("df"))
    score_term = (
        F.log(
            F.lit(1.0)
            + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        )
        * (F.col("tf") * (F.lit(k1) + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
        )
    )
    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(score_term).alias("score"))
    )
    if round_to is not None:
        scored = scored.withColumn("score", F.round("score", round_to))
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def rrf_fuse(
    rankings: list[tuple[DataFrame, str]],
    id_col: str = "doc_id",
    k: int = 60,
    top_k: int | None = 10,
    round_to: int | None = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher) of several
    ranked lists — (id, rrf_score) with rrf = Σ 1/(k + rank_i), ranks
    1-based within each list, absent ids simply contribute nothing.

    ``rankings`` is [(df, score_col), ...]; each df is ranked by
    (score desc, id) — give the score columns a deterministic rounding
    upstream so rank assignment is engine-portable.

    Scale note: the inputs are already TOP-N lists (bounded — the
    expensive global work happened inside each retriever), so the
    single-partition rank windows here run over a few hundred rows; the
    fusion itself is one union + one hash aggregate."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    from pyspark.sql import Window

    parts = []
    for df, score_col in rankings:
        w = Window.orderBy(F.desc(score_col), F.col(id_col))
        parts.append(
            df.select(F.col(id_col), F.row_number().over(w).alias("__r"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    score = F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("__r")))
    if round_to is not None:
        score = F.round(score, round_to)
    out = u.groupBy(id_col).agg(score.alias("rrf_score"))
    out = out.orderBy(F.desc("rrf_score"), F.col(id_col))
    return out.limit(top_k) if top_k is not None else out


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vectors: DataFrame,
    k: int = 10,
    depth: int = 50,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid lexical+semantic retrieval: BM25 top-``depth`` fused with
    embedding-cosine top-``depth`` by reciprocal-rank fusion — the
    standard two-tower RAG retrieval shape, entirely as Spark plans.

    ``query_vectors`` is a 1-row frame with the query embedding (same
    schema as ``embeddings``); vector ids are assumed to share the
    document id space."""
    from druid_hadoop_utils_spark.operators.similarity import brute_force_topk

    bm = bm25_topk(docs, query_terms, k=depth, id_col=id_col,
                   text_col=text_col, round_to=6)
    cos = brute_force_topk(embeddings, query_vectors, k=depth,
                           id_col=vec_id_col)
    cos = cos.select(
        F.col("neighbor_id").alias(id_col),
        F.round("cos_sim", 6).alias("__cos"),
    )
    return rrf_fuse([(bm, "score"), (cos, "__cos")], id_col=id_col,
                    k=rrf_k, top_k=k)
