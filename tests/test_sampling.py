"""Deterministic hash sampling/splitting: stability, disjointness,
stratified fractions."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators import sampling as S


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(2000).select(F.col("id").alias("doc_id"))


def test_sample_fraction_and_determinism(ids):
    a = {r.doc_id for r in S.hash_sample(ids, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in S.hash_sample(ids.repartition(13), "doc_id", 0.3).collect()}
    assert a == b  # layout-independent and rerun-stable
    assert len(a) == pytest.approx(600, rel=0.15)
    # different seed → different (but still deterministic) sample
    c = {r.doc_id for r in S.hash_sample(ids, "doc_id", 0.3, seed="other").collect()}
    assert c != a


def test_sample_is_nested(ids):
    """A smaller fraction under the same seed is a SUBSET of a larger one
    (threshold semantics) — lets pipelines grow samples incrementally."""
    small = {r.doc_id for r in S.hash_sample(ids, "doc_id", 0.1).collect()}
    big = {r.doc_id for r in S.hash_sample(ids, "doc_id", 0.4).collect()}
    assert small <= big


def test_split_disjoint_and_complete(ids):
    out = S.hash_split(ids, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    rows = out.collect()
    assert len(rows) == 2000  # fractions sum to 1 → nothing dropped
    by_split = {}
    for r in rows:
        by_split.setdefault(r.split, set()).add(r.doc_id)
    assert set(by_split) == {"train", "valid", "test"}
    assert len(by_split["train"]) == pytest.approx(1600, rel=0.1)
    # disjoint
    assert not (by_split["train"] & by_split["valid"])
    assert not (by_split["train"] & by_split["test"])


def test_stratified_fractions(spark):
    rows = [Row(doc_id=i, lang="en" if i % 2 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows)
    out = S.stratified_hash_sample(df, "doc_id", "lang",
                                   {"en": 0.5, "de": 0.1})
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] == pytest.approx(500, rel=0.2)
    assert counts["de"] == pytest.approx(100, rel=0.35)
    # unknown strata use default_fraction (0.0 → dropped)
    out2 = S.stratified_hash_sample(df, "doc_id", "lang", {"en": 0.5})
    assert out2.where(F.col("lang") == "de").count() == 0


def test_overcommitted_split_rejected(ids):
    with pytest.raises(ValueError):
        S.hash_split(ids, "doc_id", {"a": 0.9, "b": 0.2})


def test_weighted_sample_matches_python_recomputation(spark):
    """The selected set equals a python replay of the same E-S keys."""
    import hashlib
    import math

    from druid_hadoop_utils_spark.operators.sampling import weighted_hash_sample

    rows = [(i, "g%d" % (i % 2), float(1 + (i * 7) % 50)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, w double")

    def bucket(v):
        h = int(hashlib.md5(f"{v}s0".encode()).hexdigest()[:15], 16)
        return h % 1_000_000

    def key(i, w):
        return math.log((bucket(i) + 0.5) / 1_000_000) / w

    want = set()
    for g in ("g0", "g1"):
        grp = [(key(i, w), i) for (i, gg, w) in rows if gg == g]
        grp.sort(key=lambda t: (-t[0], t[1]))
        want |= {i for _, i in grp[:7]}
    got = {r.id for r in weighted_hash_sample(df, "id", "w", 7, ["g"]).collect()}
    assert got == want


def test_weighted_sample_layout_independent_and_biased(spark):
    from druid_hadoop_utils_spark.operators.sampling import weighted_hash_sample

    rows = [(i, 1000.0 if i < 20 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w double")
    a = {r.id for r in weighted_hash_sample(df, "id", "w", 25).collect()}
    b = {r.id for r in
         weighted_hash_sample(df.repartition(13), "id", "w", 25).collect()}
    assert a == b and len(a) == 25
    # the 1% of rows carrying 1000x weight should dominate the sample
    assert len([i for i in a if i < 20]) >= 15


def test_weighted_sample_global_no_window_single_partition(spark):
    """The global path must compile to TakeOrderedAndProject, not a
    one-partition window sort."""
    from druid_hadoop_utils_spark.operators.sampling import weighted_hash_sample

    df = spark.range(10_000).selectExpr("id", "cast(1 + id % 9 as double) AS w")
    out = weighted_hash_sample(df, "id", "w", 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # zero-and-negative weights never qualify
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 2.0)], "id long, w double")
    assert [r.id for r in weighted_hash_sample(df2, "id", "w", 5).collect()] == [3]


class TestLeakageSafeSplit:
    def test_duplicates_share_split(self, spark):
        # byte-identical and token-permuted duplicates all land together
        rows = [Row(doc_id=i, text=t) for i, t in enumerate(
            ["alpha beta gamma", "alpha beta gamma", "gamma beta alpha",
             "some other doc entirely", "some other doc entirely"]
            + [f"unique doc number {i} with words" for i in range(200)])]
        df = spark.createDataFrame(rows)
        out = S.leakage_safe_split(df, "text", {"train": 0.5, "valid": 0.25,
                                                "test": 0.25})
        got = {r.doc_id: r.split for r in out.collect()}
        assert got[0] == got[1] == got[2]  # permuted token set too
        assert got[3] == got[4]

    def test_no_shuffle_in_plan(self, spark):
        rows = [Row(doc_id=i, text=f"doc {i}") for i in range(50)]
        df = spark.createDataFrame(rows)
        out = S.leakage_safe_split(df, "text", {"train": 0.9, "test": 0.1})
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure map-side assignment

    def test_custom_key_column(self, spark):
        rows = [Row(doc_id=i, text=f"t{i}", cluster=i % 7) for i in range(300)]
        df = spark.createDataFrame(rows)
        out = S.leakage_safe_split(df, "text", {"train": 0.6, "test": 0.4},
                                   key=F.col("cluster"))
        per_cluster = out.groupBy("cluster").agg(
            F.count_distinct("split").alias("n")).collect()
        assert all(r.n == 1 for r in per_cluster)

    def test_deterministic_and_layout_independent(self, spark):
        rows = [Row(doc_id=i, text=f"words {i} here") for i in range(400)]
        df = spark.createDataFrame(rows)
        a = sorted(map(tuple, S.leakage_safe_split(
            df, "text", {"train": 0.8, "test": 0.2}).collect()))
        b = sorted(map(tuple, S.leakage_safe_split(
            df.repartition(11), "text", {"train": 0.8, "test": 0.2}).collect()))
        assert a == b


class TestMixSources:
    def test_composition_matches_weights(self, spark, sf_dir):
        from druid_hadoop_utils_spark.operators.sampling import mix_sources
        from druid_hadoop_utils_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        weights = {"en": 0.5, "de": 0.3, "fr": 0.2}
        out = mix_sources(docs, "doc_id", "lang", weights)
        got = {r.lang: r.n for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        raw = {r.lang: r.n for r in
               docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        scale = min(raw[s] / w for s, w in weights.items())
        for s, w in weights.items():
            assert got[s] == int(scale * w)  # exact target counts
            assert got[s] <= raw[s]          # never oversampled
        # the binding source is kept (nearly) whole
        binding = min(weights, key=lambda s: raw[s] / weights[s])
        assert got[binding] >= raw[binding] - 1

    def test_layout_independent(self, spark, sf_dir):
        from druid_hadoop_utils_spark.operators.sampling import mix_sources
        from druid_hadoop_utils_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        w = {"en": 0.6, "zh": 0.4}
        a = {r.doc_id for r in mix_sources(docs, "doc_id", "lang", w).collect()}
        b = {r.doc_id for r in
             mix_sources(docs.repartition(13), "doc_id", "lang", w).collect()}
        assert a == b

    def test_errors(self, spark, sf_dir):
        from druid_hadoop_utils_spark.operators.sampling import mix_sources
        from druid_hadoop_utils_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        with pytest.raises(ValueError, match="no rows"):
            mix_sources(docs, "doc_id", "lang", {"en": 0.5, "klingon": 0.5})
        with pytest.raises(ValueError, match="positive"):
            mix_sources(docs, "doc_id", "lang", {"en": -1.0})
        with pytest.raises(ValueError, match="at least one"):
            mix_sources(docs, "doc_id", "lang", {})


class TestPackDocuments:
    def test_pack_invariants(self, spark, sf_dir):
        from druid_hadoop_utils_spark.operators.packing import (
            pack_documents,
            pack_stats,
        )
        from druid_hadoop_utils_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
        budget = 4096
        out = pack_documents(docs, "doc_id", "n_chars", budget)
        rows = out.collect()
        assert len(rows) == docs.where(F.col("n_chars") > 0).count()
        max_size = docs.agg(F.max("n_chars")).first()[0]
        stats = pack_stats(out, "n_chars", budget).collect()
        # every pack but possibly the last is filled past nothing-fits:
        # streaming next-fit bound total < budget + max_doc
        for r in stats:
            assert r.total_size < budget + max_size
        # pack ids are dense 0..P-1
        ids = sorted(r.pack_id for r in stats)
        assert ids == list(range(len(ids)))
        # conservation: sum of pack totals == sum of doc sizes
        assert sum(r.total_size for r in stats) == \
            docs.where(F.col("n_chars") > 0).agg(F.sum("n_chars")).first()[0]

    def test_layout_independent_and_deterministic(self, spark, sf_dir):
        from druid_hadoop_utils_spark.operators.packing import pack_documents
        from druid_hadoop_utils_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
        a = sorted(map(tuple, pack_documents(
            docs, "doc_id", "n_chars", 4096).collect()))
        b = sorted(map(tuple, pack_documents(
            docs.repartition(17), "doc_id", "n_chars", 4096).collect()))
        assert a == b

    def test_grouped_packing_restarts_per_group(self, spark, sf_dir):
        from druid_hadoop_utils_spark.operators.packing import pack_documents
        from druid_hadoop_utils_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        out = pack_documents(docs, "doc_id", "n_chars", 8192,
                             group_cols=["lang"])
        firsts = out.groupBy("lang").agg(F.min("pack_id").alias("p0")).collect()
        assert all(r.p0 == 0 for r in firsts)

    def test_validation(self, spark, sf_dir):
        from druid_hadoop_utils_spark.operators.packing import pack_documents
        from druid_hadoop_utils_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
        with pytest.raises(ValueError, match="budget"):
            pack_documents(docs, "doc_id", "n_chars", 0)
        with pytest.raises(ValueError, match="n_buckets"):
            pack_documents(docs, "doc_id", "n_chars", 100, n_buckets=0)


class TestCapPerGroup:
    def test_cap_and_nesting(self, spark):
        rows = [Row(doc_id=i, grp="a" if i % 3 else "b") for i in range(300)]
        df = spark.createDataFrame(rows)
        small = S.cap_per_group(df, "doc_id", ["grp"], 10)
        big = S.cap_per_group(df, "doc_id", ["grp"], 25)
        counts = {r.grp: r.n for r in small.groupBy("grp").agg(
            F.count("*").alias("n")).collect()}
        assert all(v == 10 for v in counts.values())
        # nested: larger cap keeps a superset
        s_ids = {r.doc_id for r in small.collect()}
        b_ids = {r.doc_id for r in big.collect()}
        assert s_ids <= b_ids

    def test_layout_independent(self, spark):
        rows = [Row(doc_id=i, grp=str(i % 5)) for i in range(200)]
        df = spark.createDataFrame(rows)
        a = sorted(r.doc_id for r in S.cap_per_group(
            df, "doc_id", ["grp"], 7).collect())
        b = sorted(r.doc_id for r in S.cap_per_group(
            df.repartition(17), "doc_id", ["grp"], 7).collect())
        assert a == b

    def test_groups_below_cap_untouched(self, spark):
        rows = [Row(doc_id=i, grp="x") for i in range(5)]
        df = spark.createDataFrame(rows)
        assert S.cap_per_group(df, "doc_id", ["grp"], 100).count() == 5

    def test_validation(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, grp="x")])
        with pytest.raises(ValueError, match="n must be positive"):
            S.cap_per_group(df, "doc_id", ["grp"], 0)


class TestMixTemperature:
    def test_sqrt_weights_upsample_tail(self, spark, sf_dir):
        """T=2 keeps relative proportions compressed: the kept-count
        ratio between the biggest and smallest language must shrink from
        n_big/n_small toward sqrt(n_big/n_small); each source keeps
        floor(min_t sqrt(n_t) * sqrt(n_s)) rows."""
        import math

        from druid_hadoop_utils_spark.operators.sampling import mix_sources
        from druid_hadoop_utils_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        raw = {r.lang: r.n for r in
               docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        out = mix_sources(docs, "doc_id", "lang", temperature=2.0)
        got = {r.lang: r.n for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        smin = min(math.sqrt(n) for n in raw.values())
        for s, n in raw.items():
            assert got.get(s, 0) == int(smin * math.sqrt(n)), (s, got)
        # the smallest source is kept (nearly) whole; ratios compressed
        small = min(raw, key=raw.get)
        big = max(raw, key=raw.get)
        assert got[small] >= raw[small] - 1
        if raw[big] > raw[small]:
            assert got[big] / got[small] < raw[big] / raw[small]

    def test_exactly_one_of_weights_or_temperature(self, spark, sf_dir):
        from druid_hadoop_utils_spark.operators.sampling import mix_sources
        from druid_hadoop_utils_spark.sources.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
        with pytest.raises(ValueError, match="exactly one"):
            mix_sources(docs, "doc_id", "lang")
        with pytest.raises(ValueError, match="exactly one"):
            mix_sources(docs, "doc_id", "lang", {"en": 1.0}, temperature=2.0)
        with pytest.raises(ValueError, match="temperature"):
            mix_sources(docs, "doc_id", "lang", temperature=0.0)

    def test_temperature_weights_values(self):
        import math

        from druid_hadoop_utils_spark.operators.sampling import (
            temperature_weights,
        )

        w = temperature_weights({"a": 100, "b": 4}, 2.0)
        assert w == {"a": 10.0, "b": 2.0}
        w1 = temperature_weights({"a": 100, "b": 4}, 1.0)
        assert w1 == {"a": 100.0, "b": 4.0}
        w3 = temperature_weights({"a": 8}, 3.0)
        assert w3["a"] == pytest.approx(2.0)
        with pytest.raises(ValueError, match="at least one"):
            temperature_weights({}, 2.0)


class TestDeterministicShuffle:
    def _df(self, spark, n=500, parts=1):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("host"), (F.col("id") % 7)).alias("source"),
        ).repartition(parts)

    def test_positions_are_a_permutation(self, spark):
        from druid_hadoop_utils_spark.operators.sampling import (
            deterministic_shuffle,
        )

        out = deterministic_shuffle(self._df(spark), "doc_id")
        pos = sorted(r.shuffle_pos for r in out.collect())
        assert pos == list(range(500))

    def test_layout_independent_and_rerun_stable(self, spark):
        from druid_hadoop_utils_spark.operators.sampling import (
            deterministic_shuffle,
        )

        a = {(r.doc_id, r.shuffle_pos) for r in
             deterministic_shuffle(self._df(spark, parts=1), "doc_id").collect()}
        b = {(r.doc_id, r.shuffle_pos) for r in
             deterministic_shuffle(self._df(spark, parts=13), "doc_id").collect()}
        assert a == b

    def test_seed_changes_the_permutation(self, spark):
        from druid_hadoop_utils_spark.operators.sampling import (
            deterministic_shuffle,
        )

        a = {(r.doc_id, r.shuffle_pos) for r in
             deterministic_shuffle(self._df(spark), "doc_id", seed="s0").collect()}
        b = {(r.doc_id, r.shuffle_pos) for r in
             deterministic_shuffle(self._df(spark), "doc_id", seed="s1").collect()}
        assert a != b
        assert {p for _, p in a} == {p for _, p in b}  # both permutations

    def test_shuffle_actually_scatters_adjacent_ids(self, spark):
        from druid_hadoop_utils_spark.operators.sampling import (
            deterministic_shuffle,
        )

        out = {r.doc_id: r.shuffle_pos for r in
               deterministic_shuffle(self._df(spark), "doc_id").collect()}
        # consecutive input ids should rarely stay consecutive: count
        # adjacent pairs that remain adjacent after the shuffle
        adjacent = sum(1 for i in range(499) if abs(out[i] - out[i + 1]) == 1)
        assert adjacent < 25  # expected ~2 for a random permutation of 500

    def test_shards_balanced_and_round_robin(self, spark):
        from druid_hadoop_utils_spark.operators.sampling import (
            deterministic_shuffle,
        )

        out = deterministic_shuffle(self._df(spark, n=103), "doc_id",
                                    n_shards=8).collect()
        by_shard = {}
        for r in out:
            assert r.shard_id == r.shuffle_pos % 8
            assert r.pos_in_shard == r.shuffle_pos // 8
            by_shard.setdefault(r.shard_id, []).append(r.pos_in_shard)
        sizes = sorted(len(v) for v in by_shard.values())
        assert sizes[-1] - sizes[0] <= 1  # ±1 balance
        for v in by_shard.values():  # each shard densely numbered
            assert sorted(v) == list(range(len(v)))

    def test_rejects_bad_params(self, spark):
        from druid_hadoop_utils_spark.operators.sampling import (
            deterministic_shuffle,
        )

        with pytest.raises(ValueError, match="n_buckets"):
            deterministic_shuffle(self._df(spark), "doc_id", n_buckets=0)
        with pytest.raises(ValueError, match="n_shards"):
            deterministic_shuffle(self._df(spark), "doc_id", n_shards=0)
