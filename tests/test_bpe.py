"""BPE training/encoding (operators/bpe.py) vs a clean-room reference.

The reference implementation below is a direct, UNOPTIMIZED
transcription of the published algorithm (Sennrich et al. 2016,
Algorithm 1: recount every pair each iteration, rewrite every word) —
the engine's incremental inverted-index loop must produce IDENTICAL
merges, and the Arrow-batched encoder must produce IDENTICAL pieces,
on corpora with ties, repeats, and unicode.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Row

from druid_hadoop_utils_spark.operators.bpe import (
    END_OF_WORD,
    _apply_merges,
    bpe_encode,
    train_bpe,
)


def naive_bpe(word_counts: dict[str, int], n_merges: int):
    """Sennrich et al. Algorithm 1, transcribed directly."""
    vocab = {tuple(list(w) + [END_OF_WORD]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for word, c in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (a, b), best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if best < 2:
            break
        merges.append((a, b))
        new = {}
        for word, c in vocab.items():
            out, i = [], 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "naïve café naïve café naïve",   # unicode
    "low lower lowest",
]


def _word_counts(texts):
    wc: Counter = Counter()
    for t in texts:
        wc.update(w for w in t.lower().split() if w)
    return dict(wc)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)])


def test_merges_match_published_algorithm(spark, docs):
    got = train_bpe(docs, vocab_size=60, min_count=1)
    got_merges = [(r["left"], r["right"])
                  for r in got.orderBy("rank").collect()]
    want = naive_bpe(_word_counts(CORPUS), n_merges=60 - len(
        {c for t in CORPUS for c in t.lower().replace(" ", "")}
        | {END_OF_WORD}))
    assert got_merges == want
    assert len(got_merges) > 3


def test_training_is_deterministic(spark, docs):
    a = [tuple(r) for r in train_bpe(docs, vocab_size=40, min_count=1)
         .orderBy("rank").collect()]
    b = [tuple(r) for r in train_bpe(docs, vocab_size=40, min_count=1)
         .orderBy("rank").collect()]
    assert a == b


def test_encode_matches_reference_segmentation(spark, docs):
    merges = train_bpe(docs, vocab_size=45, min_count=1)
    ranks = {(r["left"], r["right"]): r["rank"] for r in merges.collect()}
    enc = {r["doc_id"]: list(r["pieces"])
           for r in bpe_encode(docs, merges).collect()}
    for i, t in enumerate(CORPUS):
        want = []
        for w in t.lower().split():
            want.extend(_apply_merges(w, ranks))
        assert enc[i] == want, f"doc {i}"
    # every word's pieces concatenate back to word + </w> (lossless)
    for i, t in enumerate(CORPUS):
        assert "".join(enc[i]) == "".join(
            w + END_OF_WORD for w in t.lower().split())


def test_oov_word_falls_back_to_characters(spark, docs):
    merges = train_bpe(docs, vocab_size=45, min_count=1)
    unseen = spark.createDataFrame([Row(doc_id=0, text="zzqqxx")])
    pieces = bpe_encode(unseen, merges).collect()[0]["pieces"]
    assert "".join(pieces) == "zzqqxx" + END_OF_WORD
    # unseen characters can never merge: all singleton chars + marker
    assert list(pieces)[:-1] == list("zzqqxx") or len(pieces) >= 3


def test_vocab_size_at_or_below_alphabet_means_no_merges(spark, docs):
    merges = train_bpe(docs, vocab_size=2, min_count=1)
    assert merges.count() == 0
    enc = bpe_encode(docs, merges).collect()
    row = {r["doc_id"]: r for r in enc}[0]
    assert list(row["pieces"])[:3] == ["l", "o", "w"]  # pure characters


def test_hapax_pairs_never_merge(spark):
    docs = spark.createDataFrame([Row(doc_id=0, text="abcdef uvwxyz")])
    # every pair occurs once: merging would memorize the corpus tail
    assert train_bpe(docs, vocab_size=1000, min_count=1).count() == 0


def test_refusals(spark, docs):
    with pytest.raises(ValueError, match="max_distinct_words"):
        train_bpe(docs, vocab_size=40, min_count=1, max_distinct_words=3)
    empty = spark.createDataFrame([Row(doc_id=0, text="   ")])
    with pytest.raises(ValueError, match="empty corpus"):
        train_bpe(empty, vocab_size=40, min_count=1)


def test_min_count_trims_tail_before_training(spark):
    docs = spark.createDataFrame([
        Row(doc_id=0, text="aaa aaa aaa aaa rare"),
    ])
    merges = [(r["left"], r["right"]) for r in
              train_bpe(docs, vocab_size=30, min_count=2).collect()]
    flat = "".join(a + b for a, b in merges)
    assert "r" not in flat  # 'rare' was cut before the loop ever saw it


def test_corpus_scale_path_on_documents_table(spark, sf_dir):
    """End-to-end on the synthetic documents table: train, encode, and
    pin the lossless-reconstruction property on a sample."""
    from druid_hadoop_utils_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = train_bpe(docs, vocab_size=300, min_count=2)
    n_merges = merges.count()
    assert n_merges > 50  # real corpus: the loop runs well past trivial
    enc = bpe_encode(docs.limit(50), merges)
    rows = enc.collect()
    assert all(r["n_pieces"] == len(r["pieces"]) for r in rows)
    texts = {r["doc_id"]: r["text"] for r in docs.limit(50).collect()}
    for r in rows:
        want = "".join(w + END_OF_WORD
                       for w in texts[r["doc_id"]].lower().split() if w)
        assert "".join(r["pieces"]) == want


# ---------------------------------------------------------------------
# independent encode verification (VERDICT r10 item 6): the engine's
# greedy lowest-rank-first encoder vs a clean-room SEQUENTIAL encoder
# (apply each learned merge in rank order, as Sennrich et al. describe
# applying the learned operations). For training-consistent merge
# tables — every merged symbol's constituents were formed at an earlier
# rank, which train_bpe guarantees by construction — the two strategies
# provably coincide; randomized corpora exercise that equivalence far
# beyond the hand-written fixtures.
# ---------------------------------------------------------------------


def naive_encode(word, merges_list):
    """Sequential-rank application: for each learned merge (in learning
    order), merge every adjacent occurrence left-to-right. No ranks
    dict, no greedy scan — a different algorithm shape from the
    engine's _apply_merges."""
    s = list(word) + [END_OF_WORD]
    for a, b in merges_list:
        i = 0
        while i < len(s) - 1:
            if s[i] == a and s[i + 1] == b:
                s[i:i + 2] = [a + b]
            else:
                i += 1
    return s


@pytest.mark.slow
def test_encode_equals_naive_sequential_on_random_corpora(spark):
    import random

    rng = random.Random(20260815)
    for trial in range(12):
        alphabet = "ab" if trial % 3 == 0 else "abc"
        words = ["".join(rng.choice(alphabet)
                         for _ in range(rng.randint(1, 8)))
                 for _ in range(rng.randint(5, 40))]
        texts = [" ".join(rng.choices(words, k=rng.randint(1, 30)))
                 for _ in range(8)]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING")
        merges = train_bpe(docs, vocab_size=rng.randint(8, 40), min_count=1)
        ordered = [(r["left"], r["right"])
                   for r in merges.orderBy("rank").collect()]
        ranks = {p: i for i, p in enumerate(ordered)}
        # level 1: per-word, engine greedy == clean-room sequential
        for w in set(words):
            assert _apply_merges(w, ranks) == naive_encode(w, ordered), \
                f"trial {trial}, word {w!r}, merges {ordered}"
        # level 2: the batched Arrow path agrees per document
        enc = {r["doc_id"]: list(r["pieces"])
               for r in bpe_encode(docs, merges).collect()}
        for i, t in enumerate(texts):
            want = []
            for w in t.lower().split():
                want.extend(naive_encode(w, ordered))
            assert enc[i] == want, f"trial {trial}, doc {i}"


def test_encode_roundtrip_reconstructs_text(spark):
    """Lossless invariant behind the q_bpe_roundtrip battery oracle:
    concatenating pieces and mapping </w> back to spaces restores the
    whitespace-normalized lowercased text exactly."""
    texts = ["Hello hello world", "  spaced   out\ttabs  ", "solo"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id INT, text STRING")
    merges = train_bpe(docs, vocab_size=40, min_count=1)
    enc = {r["doc_id"]: list(r["pieces"])
           for r in bpe_encode(docs, merges).collect()}
    for i, t in enumerate(texts):
        restored = "".join(enc[i]).replace(END_OF_WORD, " ").rstrip()
        assert restored == " ".join(t.lower().split()), f"doc {i}"
