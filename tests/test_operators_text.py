import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog and it is fast"),
        Row(doc_id=2, text="el perro corre por la calle y los gatos duermen en una casa"),
        Row(doc_id=3, text="le chat est dans la maison et les oiseaux chantent pour nous"),
        Row(doc_id=4, text="der hund ist nicht da und die katze schläft mit dem kind"),
        Row(doc_id=5, text="你好 世界 这是 中文 文本"),
        Row(doc_id=6, text="zzz qqq xxx"),
        Row(doc_id=7, text="?! ;; :: %% ^^ && ##"),
    ]
    return spark.createDataFrame(rows)


def test_token_count(docs):
    got = {r.doc_id: r.n for r in docs.select("doc_id", T.token_count("text").alias("n")).collect()}
    assert got[1] == 13
    assert got[6] == 3


def test_bpe_ish_token_count_exceeds_words(docs):
    got = docs.select(
        T.token_count("text").alias("w"), T.bpe_ish_token_count("text").alias("b")
    ).where(F.col("b") < F.col("w")).count()
    assert got == 0  # BPE-ish pieces >= whitespace words


def test_fingerprint_order_invariant(spark):
    a = spark.createDataFrame([Row(text="alpha beta gamma")])
    b = spark.createDataFrame([Row(text="gamma alpha beta alpha")])
    fa = a.select(T.fingerprint("text").alias("f")).first().f
    fb = b.select(T.fingerprint("text").alias("f")).first().f
    assert fa == fb  # same token set → same fingerprint


def test_lang_id(docs):
    got = {r.doc_id: r.lang for r in docs.select("doc_id", T.lang_id("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "es"
    assert got[3] == "fr"
    assert got[4] == "de"
    assert got[5] == "zh"
    assert got[6] == "und"


def test_quality_score_gates(docs):
    got = {r.doc_id: r.q for r in docs.select(
        "doc_id", T.quality_score("text", min_tokens=5).alias("q")).collect()}
    assert got[1] == 1
    assert got[6] == 0  # too few tokens
    assert got[7] == 0  # too much non-alpha


def test_with_text_analysis_schema(docs):
    out = T.with_text_analysis(docs)
    for col in ["n_tokens", "n_bpe_tokens", "fingerprint", "pred_lang",
                "quality_keep", "avg_token_len", "nonalpha_ratio"]:
        assert col in out.columns
    assert out.count() == 7


def test_normalize_text(spark):
    df = spark.createDataFrame([Row(text="  Hello\x01  WORLD\t\tfoo \n bar  ")])
    got = df.select(T.normalize_text("text").alias("n")).first().n
    assert got == "hello world foo bar"


def test_repetition_ratio(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c d"),          # all distinct -> 0
        Row(doc_id=2, text="a a a a"),          # 3 of 4 repeat -> 0.75
        Row(doc_id=3, text="x y x y"),          # 0.5
    ])
    got = {r.doc_id: r.rr for r in df.select(
        "doc_id", T.repetition_ratio("text").alias("rr")).collect()}
    assert got == {1: 0.0, 2: 0.75, 3: 0.5}


def test_tfidf_top_terms(spark):
    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame([
        Row(doc_id=1, text="apple apple banana common"),
        Row(doc_id=2, text="banana cherry common"),
        Row(doc_id=3, text="cherry cherry cherry common"),
    ])
    out = tfidf_top_terms(docs, "doc_id", k=1)
    top = {r.doc_id: r.term for r in out.collect()}
    # "common" appears in every doc → idf = ln(1) = 0 → never the top term
    assert top == {1: "apple", 2: "banana", 3: "cherry"}
    assert all(r.score > 0 for r in out.collect())


def test_chunk_documents(spark):
    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([Row(doc_id=1, text=text),
                                Row(doc_id=2, text="short text")])
    out = chunk_documents(df, "doc_id", chunk_tokens=4, overlap=1)
    rows = sorted((r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens)
                  for r in out.collect())
    # stride 3: starts 1,4,7 cover w0..w9 with 1-token overlap
    assert rows == [
        (1, 0, "w0 w1 w2 w3", 4),
        (1, 1, "w3 w4 w5 w6", 4),
        (1, 2, "w6 w7 w8 w9", 4),
        (2, 0, "short text", 2),
    ]
    # every token appears in at least one chunk
    covered = set(" ".join(r[2] for r in rows if r[0] == 1).split())
    assert covered == {f"w{i}" for i in range(10)}


def test_winnowing_fingerprints_guarantee(spark):
    """Winnowing invariants (MOSS): identical docs → identical prints; a
    shared substring of length k+window-1 → at least one shared print; a
    single-char edit perturbs only a bounded share of prints; disjoint
    alphabets share nothing."""
    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.text import winnowing_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again"
    edited = base.replace("jumps", "leaps")
    other = "zxqwv " * 12
    df = spark.createDataFrame(
        [Row(i=1, t=base), Row(i=2, t=base), Row(i=3, t=edited),
         Row(i=4, t=other)]
    )
    out = {r.i: set(r.fp) for r in df.select(
        "i", winnowing_fingerprints("t", k=8, window=4).alias("fp")
    ).collect()}
    assert out[1] == out[2]                      # deterministic
    inter = len(out[1] & out[3]) / len(out[1] | out[3])
    assert inter >= 0.5, f"near-dup overlap too low: {inter}"
    assert not (out[1] & out[4])                 # unrelated docs disjoint


def test_winnowing_short_and_empty_docs(spark):
    """Docs shorter than k still produce one fingerprint (whole-text gram);
    empty text yields the empty-string gram rather than failing."""
    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.text import winnowing_fingerprints

    df = spark.createDataFrame([Row(i=1, t="hi"), Row(i=2, t="")])
    out = {r.i: r.fp for r in df.select(
        "i", winnowing_fingerprints("t").alias("fp")).collect()}
    assert len(out[1]) == 1 and len(out[2]) == 1
    assert out[1] != out[2]


def test_contamination_pairs_detects_planted_leak(spark):
    """A test doc sharing a long substring with a train doc is flagged;
    unrelated docs are not; ubiquitous boilerplate is capped out."""
    import random

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.text import contamination_pairs

    rng = random.Random(7)

    def sentence(n):
        return " ".join(
            "".join(rng.choice("abcdefghij") for _ in range(6)) for _ in range(n)
        )

    leaked = sentence(30)
    boiler = "all rights reserved terms of service apply"
    rows = [
        Row(doc_id=1, split="train", text=leaked + " " + boiler),
        Row(doc_id=2, split="test", text="intro words " + leaked + " " + boiler),
        Row(doc_id=3, split="train", text=sentence(30) + " " + boiler),
        Row(doc_id=4, split="test", text=sentence(30) + " " + boiler),
    ]
    # boilerplate appears in all 4 docs, so the cap (<=3 docs) removes its
    # fingerprints; only the planted leak survives the min_shared gate
    got = contamination_pairs(
        spark.createDataFrame(rows), min_shared=5, max_fp_docs=3
    ).collect()
    assert [(r.train_id, r.test_id) for r in got] == [(1, 2)]
    assert got[0].shared_fps >= 5

    # without the cap, boiler fingerprints link even unrelated docs —
    # pinning that the cap is what keeps candidate volume bounded
    uncapped = contamination_pairs(
        spark.createDataFrame(rows), min_shared=1, max_fp_docs=None
    )
    pairs = {(r.train_id, r.test_id) for r in uncapped.collect()}
    assert (3, 4) in pairs and (1, 2) in pairs


def test_redact_text_and_counts(spark):
    from pyspark.sql import Row

    from druid_hadoop_utils_spark.operators.text import (
        redact_text,
        redaction_counts,
    )

    df = spark.createDataFrame([
        Row(i=1, t="mail a.b+c@foo.org or https://x.io/p?q=1#f tel 5551234567"),
        Row(i=2, t="clean text, short num 123456"),
        Row(i=3, t="ftp://not-matched and user@localhost (no tld)"),
    ])
    counts = redaction_counts("t")
    out = {r.i: r for r in df.select(
        "i", redact_text("t").alias("red"),
        counts["url"].alias("u"), counts["email"].alias("e"),
        counts["number"].alias("n")).collect()}
    assert out[1].red == "mail <EMAIL> or <URL> tel <NUMBER>"
    assert (out[1].u, out[1].e, out[1].n) == (1, 1, 1)
    assert out[2].red == out[2]["red"] == "clean text, short num 123456"
    assert (out[2].u, out[2].e, out[2].n) == (0, 0, 0)
    # no scheme match, no TLD match: untouched
    assert out[3].red == "ftp://not-matched and user@localhost (no tld)"


class TestLmScore:
    def test_bigrams_pairs_and_short_docs(self, spark):
        from druid_hadoop_utils_spark.operators.text import bigrams

        df = spark.createDataFrame([
            Row(doc_id=1, text="a b c"),
            Row(doc_id=2, text="solo"),
            Row(doc_id=3, text=""),
        ])
        got = {(r.doc_id, r.prev, r.cur) for r in bigrams(df).collect()}
        assert got == {(1, "a", "b"), (1, "b", "c")}

    def test_typical_text_scores_above_gibberish(self, spark):
        from druid_hadoop_utils_spark.operators.text import lm_score

        rows = [Row(doc_id=i, text="the cat sat on the mat " * 3)
                for i in range(20)]
        rows.append(Row(doc_id=99, text="zqx vvk jjw qqp zzt xxo"))
        df = spark.createDataFrame(rows)
        scores = {r.doc_id: r.avg_logp for r in lm_score(df).collect()}
        typical = scores[0]
        gib = scores[99]
        assert typical > gib + 1.0, (typical, gib)

    def test_n_bigrams_counted(self, spark):
        from druid_hadoop_utils_spark.operators.text import lm_score

        df = spark.createDataFrame([Row(doc_id=1, text="w x y z")])
        row = lm_score(df).collect()[0]
        assert row.n_bigrams == 3

    def test_alpha_validation(self, spark):
        from druid_hadoop_utils_spark.operators.text import lm_score

        df = spark.createDataFrame([Row(doc_id=1, text="a b")])
        with pytest.raises(ValueError, match="alpha"):
            lm_score(df, alpha=0.0)


class TestVocabEncode:
    def test_vocab_ranks_by_frequency_then_token(self, spark):
        from druid_hadoop_utils_spark.operators.text import build_vocab

        df = spark.createDataFrame([
            Row(doc_id=1, text="b b b a a c"),
            Row(doc_id=2, text="a b z"),
        ])
        v = {r.token: (r["count"], r.token_id) for r in build_vocab(df).collect()}
        assert v["b"] == (4, 0)
        assert v["a"] == (3, 1)
        assert v["c"] == (1, 2)  # count tie with z → lexical order
        assert v["z"] == (1, 3)

    def test_vocab_cuts(self, spark):
        from druid_hadoop_utils_spark.operators.text import build_vocab

        df = spark.createDataFrame([Row(doc_id=1, text="a a b c")])
        assert {r.token for r in
                build_vocab(df, min_count=2).collect()} == {"a"}
        assert build_vocab(df, max_size=2).count() == 2

    def test_encode_preserves_order_and_oov(self, spark):
        from druid_hadoop_utils_spark.operators.text import (
            build_vocab,
            encode_documents,
        )

        corpus = spark.createDataFrame(
            [Row(doc_id=1, text="the cat sat"), Row(doc_id=2, text="the the")])
        vocab = build_vocab(corpus)  # the=0, cat/sat by lex
        new = spark.createDataFrame([Row(doc_id=9, text="sat the unknown cat")])
        row = encode_documents(new, vocab).first()
        v = {r.token: r.token_id for r in vocab.collect()}
        assert row.input_ids == [v["sat"], v["the"], -1, v["cat"]]
        assert row.n_tokens == 4

    def test_encode_layout_independent(self, spark):
        from druid_hadoop_utils_spark.operators.text import (
            build_vocab,
            encode_documents,
        )

        docs = spark.createDataFrame(
            [Row(doc_id=i, text=f"w{i % 5} w{(i * 3) % 7} common")
             for i in range(100)])
        vocab = build_vocab(docs)
        a = sorted((r.doc_id, tuple(r.input_ids)) for r in
                   encode_documents(docs, vocab).collect())
        b = sorted((r.doc_id, tuple(r.input_ids)) for r in
                   encode_documents(docs.repartition(13), vocab).collect())
        assert a == b
