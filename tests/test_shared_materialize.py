"""The size-gated shared-subtree materialization (operators/shared.py,
round-15 optimization): below the input-size threshold the frame is
returned unchanged (Catalyst re-expands the subtree per consumer —
cheaper than a materialization job for KB-scale inputs); above it, or
when forced via conf, the frame is lazily checkpointed. Results are
identical either way."""

import pytest
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators.shared import (
    DEFAULT_MIN_INPUT_BYTES,
    MIN_INPUT_BYTES_CONF,
    materialize_shared,
    shared_input_bytes,
)


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


class TestGate:
    def test_below_threshold_returns_input_unchanged(self, docs):
        small = docs.select("doc_id", "text")
        out = materialize_shared(small)
        # sf test data is KBs; default gate is 64 MiB
        assert out is small

    def test_zero_threshold_forces_materialization(self, docs):
        small = docs.select("doc_id", "text")
        out = materialize_shared(small, min_input_bytes=0)
        assert out is not small
        # checkpointed frame computes the same rows
        assert sorted(r.doc_id for r in out.collect()) == sorted(
            r.doc_id for r in small.collect()
        )

    def test_negative_threshold_never_materializes(self, docs):
        small = docs.select("doc_id", "text")
        assert materialize_shared(small, min_input_bytes=-1) is small

    def test_conf_override(self, spark, docs):
        small = docs.select("doc_id", "text")
        old = spark.conf.get(MIN_INPUT_BYTES_CONF, None)
        spark.conf.set(MIN_INPUT_BYTES_CONF, "1")
        try:
            # every real input exceeds 1 byte -> materializes
            assert materialize_shared(small) is not small
        finally:
            if old is None:
                spark.conf.unset(MIN_INPUT_BYTES_CONF)
            else:
                spark.conf.set(MIN_INPUT_BYTES_CONF, old)

    def test_input_bytes_tracks_leaf_relations(self, docs):
        # the gate estimates RECOMPUTE cost: leaf relation sizes, not
        # the (possibly tiny) output estimate — an aggregate over the
        # corpus must report corpus-scale input
        agg = docs.groupBy().agg(F.count("*").alias("n"))
        est = shared_input_bytes(agg)
        assert est is not None and est > 0
        base = shared_input_bytes(docs)
        assert base is not None and est >= base // 2

    def test_default_threshold_is_scale_shaped(self):
        assert DEFAULT_MIN_INPUT_BYTES == 64 * 1024 * 1024


class TestDedupNoSessionPinnedCache:
    """r15: the dedup pipelines materialize their shared frames via
    localCheckpoint (ContextCleaner-reclaimed on GC), never via
    DataFrame.persist — persist registers in the CacheManager, which
    holds the blocks for the SESSION lifetime, so every crawl increment
    would leak one corpus-scale shingle frame (the class round 14
    closed for similarity)."""

    def test_dedup_pipelines_never_call_persist(self, spark, sf_dir):
        from pyspark.sql.classic.dataframe import DataFrame

        from druid_hadoop_utils_spark.operators import dedup as D

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        seen = docs.where(F.col("doc_id") % 2 == 0)
        new = docs.where(F.col("doc_id") % 2 == 1)
        manifest = D.signature_manifest(seen, "doc_id")

        calls = []
        orig = DataFrame.persist

        def recording(self, *a, **k):
            calls.append(self)
            return orig(self, *a, **k)

        DataFrame.persist = recording
        try:
            batch = D.minhash_lsh_dedup_pairs(docs, "doc_id",
                                              threshold=0.5)
            inc = D.incremental_neardup_pairs(
                new, manifest, "doc_id", threshold=0.5, verify_with=docs)
        finally:
            DataFrame.persist = orig
        assert calls == []
        # the swapped primitive still computes the same pairs
        assert batch.count() > 0
        assert inc.count() >= 0


class TestOperatorsUnchangedResults:
    """The gated operators produce identical results with the gate
    forced on and forced off (materialization never changes rows)."""

    def _rows(self, df):
        return sorted(map(tuple, df.collect()))

    @pytest.mark.parametrize("forced", ["0", "-1"])
    def test_funnel_and_cohort(self, spark, sf_dir, forced):
        from druid_hadoop_utils_spark.operators.events import (
            cohort_retention,
            funnel_counts,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        old = spark.conf.get(MIN_INPUT_BYTES_CONF, None)
        steps = ["view", "click", "purchase"]
        spark.conf.set(MIN_INPUT_BYTES_CONF, forced)
        try:
            got_f = self._rows(funnel_counts(ev, steps))
            got_c = self._rows(cohort_retention(ev))
        finally:
            if old is None:
                spark.conf.unset(MIN_INPUT_BYTES_CONF)
            else:
                spark.conf.set(MIN_INPUT_BYTES_CONF, old)
        want_f = self._rows(funnel_counts(ev, steps))
        want_c = self._rows(cohort_retention(ev))
        assert got_f == want_f
        assert got_c == want_c

    @pytest.mark.parametrize("forced", ["0", "-1"])
    def test_lm_score_and_bm25(self, spark, sf_dir, forced):
        from druid_hadoop_utils_spark.operators.search import bm25_topk
        from druid_hadoop_utils_spark.operators.text import lm_score

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        old = spark.conf.get(MIN_INPUT_BYTES_CONF, None)
        spark.conf.set(MIN_INPUT_BYTES_CONF, forced)
        try:
            got_lm = self._rows(lm_score(docs))
            got_bm = self._rows(bm25_topk(docs, ["join", "spark", "table"]))
        finally:
            if old is None:
                spark.conf.unset(MIN_INPUT_BYTES_CONF)
            else:
                spark.conf.set(MIN_INPUT_BYTES_CONF, old)
        assert got_lm == self._rows(lm_score(docs))
        assert got_bm == self._rows(
            bm25_topk(docs, ["join", "spark", "table"])
        )
