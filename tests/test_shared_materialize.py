"""The size-gated shared-subtree materialization (operators/shared.py,
round-15 optimization; round-16 lifecycle): below the input-size
threshold the frame is returned unchanged (Catalyst re-expands the
subtree per consumer — cheaper than a materialization job for KB-scale
inputs); above it, or when forced via conf, the frame is persisted
under the deterministic per-site generation ledger. Results are
identical either way."""

import pytest
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators.shared import (
    DEFAULT_MIN_INPUT_BYTES,
    MIN_INPUT_BYTES_CONF,
    materialize_shared,
    release_shared,
    shared_input_bytes,
)


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


class TestGate:
    def test_below_threshold_returns_input_unchanged(self, docs):
        small = docs.select("doc_id", "text")
        out = materialize_shared(small)
        # sf test data is KBs; default gate is 16 MiB -> inline, unpersisted
        assert out is small
        assert not out.storageLevel.useMemory

    def test_zero_threshold_forces_materialization(self, docs):
        small = docs.select("doc_id", "text")
        out = materialize_shared(small, min_input_bytes=0)
        # persist() materializes in place (returns the same frame, now
        # cached and tracked by the generation ledger)
        assert out.storageLevel.useMemory
        assert sorted(r.doc_id for r in out.collect()) == sorted(
            r.doc_id for r in docs.select("doc_id").collect()
        )
        release_shared()
        assert not out.storageLevel.useMemory

    def test_negative_threshold_never_materializes(self, docs):
        small = docs.select("doc_id", "text")
        out = materialize_shared(small, min_input_bytes=-1)
        assert out is small
        assert not out.storageLevel.useMemory

    def test_conf_override(self, spark, docs):
        small = docs.select("doc_id", "text")
        old = spark.conf.get(MIN_INPUT_BYTES_CONF, None)
        spark.conf.set(MIN_INPUT_BYTES_CONF, "1")
        try:
            # every real input exceeds 1 byte -> materializes
            assert materialize_shared(small).storageLevel.useMemory
        finally:
            release_shared()
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
        # 16 MiB: the measured r16 crossover (plans/r16/gate_crossover.md)
        # — above it materialization won on both gated text operators;
        # below it the sf-bench single-file corpora stay inline
        assert DEFAULT_MIN_INPUT_BYTES == 16 * 1024 * 1024


class TestDedupDeterministicCacheLifecycle:
    """r16: the dedup pipelines materialize their shared frames via a
    TRACKED persist (operators/shared.py generation ledger) — lineage
    stays intact for executor-loss recovery (the r15 localCheckpoint
    caveat), and each invocation releases the previous invocation's
    frames deterministically, so a long session running many crawl
    increments never accumulates corpus-scale caches (the class round
    14 closed for similarity) and every invocation recomputes from its
    inputs (no cross-invocation cache reuse through Catalyst
    plan-equality matching)."""

    def _persistent_count(self, spark):
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    def test_increments_do_not_accumulate_cache(self, spark, sf_dir):
        from druid_hadoop_utils_spark.operators import dedup as D
        from druid_hadoop_utils_spark.operators.shared import (
            release_shared,
            shared_generation_sites,
        )

        release_shared()
        base_count = self._persistent_count(spark)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        seen = docs.where(F.col("doc_id") % 2 == 0)
        manifest = D.signature_manifest(seen, "doc_id")

        counts = []
        for i in range(3):
            new = docs.where(F.col("doc_id") % 3 == i)  # distinct inputs
            D.minhash_lsh_dedup_pairs(new, "doc_id", threshold=0.5) \
                .write.format("noop").mode("overwrite").save()
            D.incremental_neardup_pairs(
                new, manifest, "doc_id", threshold=0.5, verify_with=seen
            ).write.format("noop").mode("overwrite").save()
            counts.append(self._persistent_count(spark))
        # one generation per site: 1 (minhash base) + 2 (neardup banded
        # + verify pool) live frames, NOT one more per increment
        assert counts[0] == counts[1] == counts[2], counts
        assert counts[0] - base_count <= 3
        sites = shared_generation_sites()
        assert sites.get("dedup.minhash_lsh_dedup_pairs") == 1
        assert sites.get("dedup.incremental_neardup_pairs") == 2
        # explicit release drops even the live generation
        release_shared()
        assert self._persistent_count(spark) == base_count
        assert shared_generation_sites() == {}

    def test_reinvocation_recomputes_not_cache_hits(self, spark, sf_dir):
        """Identical back-to-back invocations (the bench's min-of-3
        repeat pattern) must each recompute: the second call releases
        the first call's persisted frame BEFORE building its own plan,
        so Catalyst's plan-equality cache matching can never serve
        repeat 2 from repeat 1's blocks."""
        from druid_hadoop_utils_spark.operators import dedup as D
        from druid_hadoop_utils_spark.operators.shared import release_shared

        def persistent_ids():
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            return {int(k) for k in jmap.keySet().toArray()}

        release_shared()
        baseline = persistent_ids()
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out1 = D.minhash_lsh_dedup_pairs(docs, "doc_id", threshold=0.5)
        out1.write.format("noop").mode("overwrite").save()
        gen1 = persistent_ids() - baseline
        assert gen1  # call 1's shared frame is cached
        out2 = D.minhash_lsh_dedup_pairs(docs, "doc_id", threshold=0.5)
        out2.write.format("noop").mode("overwrite").save()
        gen2 = persistent_ids() - baseline
        # call 2 released call 1's cache entry at its own entry point
        # and registered a FRESH one: the persistent-RDD ids are
        # disjoint — an identical repeat can never be served from the
        # previous repeat's blocks, it recomputes from the inputs
        assert gen2 and not (gen1 & gen2), (gen1, gen2)
        release_shared()
        assert persistent_ids() == baseline

    def test_lineage_preserved_no_localcheckpoint_in_dedup(self, spark, sf_dir):
        """The dedup pair pipelines keep lineage (persist, not
        localCheckpoint): their analyzed plans must still reach the
        parquet relation — a localCheckpoint would sever the plan at a
        LogicalRDD. (connected_components' ITERATIVE truncation is the
        documented exception.)"""
        from druid_hadoop_utils_spark.operators import dedup as D
        from druid_hadoop_utils_spark.operators.shared import release_shared

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = D.minhash_lsh_dedup_pairs(docs, "doc_id", threshold=0.5)
        # the analyzed plan (before cache substitution) must reach the
        # parquet relation; the r15 localCheckpoint severed it at a
        # LogicalRDD, losing recompute-on-block-loss
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "parquet" in plan
        assert "ExistingRDD" not in plan and "LogicalRDD" not in plan
        release_shared()


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
