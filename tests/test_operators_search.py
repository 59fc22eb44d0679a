"""BM25 retrieval operator semantics on a hand-computable corpus."""

import math

import pytest
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators.search import bm25_topk, corpus_term_stats


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
        (4, "apple"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_corpus_term_stats(corpus):
    stats = {r["term"]: (r["df"], r["total_tf"]) for r in corpus_term_stats(corpus).collect()}
    assert stats["apple"] == (2, 3)
    assert stats["banana"] == (2, 2)
    assert stats["cherry"] == (2, 4)
    assert stats["durian"] == (1, 1)


def test_bm25_matches_hand_formula(corpus):
    k1, b = 1.2, 0.75
    n, avgdl = 4, (3 + 2 + 4 + 1) / 4.0

    def score(tf, df, dl):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))

    out = {r["doc_id"]: r["score"] for r in
           bm25_topk(corpus, ["apple"], k=10, round_to=None).collect()}
    assert set(out) == {1, 4}
    assert out[1] == pytest.approx(score(2, 2, 3))
    assert out[4] == pytest.approx(score(1, 2, 1))


def test_bm25_multi_term_sums_and_ranks(corpus):
    out = bm25_topk(corpus, ["apple", "cherry"], k=2).collect()
    ids = [r["doc_id"] for r in out]
    # doc 3 (cherry x3) and doc 1 (apple x2) are the strongest matches
    assert len(ids) == 2 and set(ids) <= {1, 3, 4}
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_case_insensitive_query(corpus):
    a = bm25_topk(corpus, ["APPLE"], k=10).collect()
    b = bm25_topk(corpus, ["apple"], k=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bm25_empty_query_rejected(corpus):
    with pytest.raises(ValueError):
        bm25_topk(corpus, [])


def test_bm25_no_matches_is_empty(corpus):
    assert bm25_topk(corpus, ["zzz"], k=5).count() == 0


def test_bm25_plan_broadcasts_stats(corpus):
    plan = bm25_topk(corpus, ["apple"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan


def _py_bm25(corpus, query, k1=1.2, b=0.75):
    """Pure-Python reference implementation."""
    import math

    toks = {d: t.lower().split() for d, t in corpus}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    qterms = sorted({t.lower() for t in query})
    out = {}
    for d, t in toks.items():
        s = 0.0
        for term in qterms:
            tf = t.count(term)
            if tf == 0:
                continue
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if s > 0:
            out[d] = s
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bm25_matches_bruteforce_random(spark, seed):
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    corpus = [
        (i, " ".join(rng.choices(vocab, k=rng.randrange(3, 40))))
        for i in range(60)
    ]
    query = rng.sample(vocab, 4)
    want = _py_bm25(corpus, query)
    df = spark.createDataFrame(corpus, ["doc_id", "text"])
    got = {r["doc_id"]: r["score"] for r in
           bm25_topk(df, query, k=100, round_to=None).collect()}
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9), d


def test_rrf_fuse_hand_computed(spark):
    from druid_hadoop_utils_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)], ["doc_id", "s"])
    b = spark.createDataFrame([(2, 0.9), (4, 0.8)], ["doc_id", "s"])
    out = {r["doc_id"]: r["rrf_score"] for r in
           rrf_fuse([(a, "s"), (b, "s")], k=60, top_k=10).collect()}
    assert out[1] == pytest.approx(1 / 61, abs=1e-10)
    # doc 2: rank 2 in a, rank 1 in b
    assert out[2] == pytest.approx(1 / 62 + 1 / 61, abs=1e-10)
    assert out[3] == pytest.approx(1 / 63, abs=1e-10)
    assert out[4] == pytest.approx(1 / 62, abs=1e-10)
    # fused winner is the doc present near the top of BOTH lists
    assert max(out, key=out.get) == 2


def test_rrf_fuse_ties_break_on_id(spark):
    from druid_hadoop_utils_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(7, 1.0), (3, 1.0)], ["doc_id", "s"])
    out = rrf_fuse([(a, "s")], top_k=2).collect()
    # equal scores: id ascending decides rank 1
    assert [r["doc_id"] for r in out] == [3, 7]


def test_rrf_fuse_empty_rejected(spark):
    from druid_hadoop_utils_spark.operators.search import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_hybrid_search_end_to_end(spark, sf_dir):
    from druid_hadoop_utils_spark.operators.search import hybrid_search
    from druid_hadoop_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.where(F.col("vec_id") == 0)
    out = hybrid_search(docs, emb, ["join", "spark"], qv, k=5).collect()
    assert len(out) == 5
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # fused score is bounded by 2 lists of rank >= 1
    assert all(0 < s <= 2 / 61 for s in scores)
