"""Empty-input robustness: every major operator on a zero-row frame must
return an empty (or sensible) result, never crash — the failure class of
incremental pipelines whose first batch is empty."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, "
            "event_type string, value double")


def test_dedup_family_empty(spark, empty_docs):
    from druid_hadoop_utils_spark.operators import dedup as D

    assert D.exact_dedup(empty_docs, ["text"], "doc_id").count() == 0
    assert D.duplicate_groups(empty_docs, ["text"], "doc_id").count() == 0
    assert D.fingerprint_manifest(empty_docs).count() == 0
    assert D.incremental_dedup(
        empty_docs, D.fingerprint_manifest(empty_docs), "doc_id"
    ).count() == 0


def test_text_family_empty(spark, empty_docs):
    from druid_hadoop_utils_spark.operators import text as T

    assert T.lm_score(empty_docs).count() == 0
    assert T.bigrams(empty_docs).count() == 0
    assert T.build_vocab(empty_docs).count() == 0
    vocab = T.build_vocab(empty_docs)
    assert T.encode_documents(empty_docs, vocab).count() == 0
    assert T.with_text_analysis(empty_docs).count() == 0


def test_sampling_family_empty(spark, empty_docs):
    from druid_hadoop_utils_spark.operators import sampling as S

    assert S.hash_sample(empty_docs, "doc_id", 0.5).count() == 0
    assert S.hash_split(empty_docs, "doc_id", {"a": 0.5, "b": 0.5}).count() == 0
    assert S.leakage_safe_split(
        empty_docs, "text", {"a": 0.5, "b": 0.5}).count() == 0
    assert S.cap_per_group(empty_docs, "doc_id", ["lang"], 5).count() == 0
    assert S.weighted_hash_sample(
        empty_docs.withColumn("w", F.lit(1.0)), "doc_id", "w", 5).count() == 0
    with pytest.raises(ValueError, match="have no rows"):
        # mix_sources refuses loudly (a silent empty mixture hides a
        # broken source column)
        S.mix_sources(empty_docs, "doc_id", "lang", {"en": 1.0})


def test_quantiles_and_frequency_empty(spark, empty_events):
    from druid_hadoop_utils_spark.functions.kll import (
        kll_quantiles,
        kll_state_grouped,
    )
    from druid_hadoop_utils_spark.functions.quantiles import rank_quantiles
    from druid_hadoop_utils_spark.operators.frequency import heavy_hitters

    assert heavy_hitters(empty_events, "user_id", min_share=0.01).count() == 0
    assert rank_quantiles(
        empty_events, "value", ["event_type"], [0.5]).count() == 0
    states = kll_state_grouped(empty_events, "value", ["event_type"])
    assert kll_quantiles(states, ["event_type"], [0.5]).count() == 0


def test_sessions_and_joins_empty(spark, empty_events):
    from druid_hadoop_utils_spark.operators.joins import asof_join
    from druid_hadoop_utils_spark.operators.sessions import (
        forward_fill,
        sessionize,
    )

    assert sessionize(empty_events, "ts", ["user_id"]).count() == 0
    assert forward_fill(
        empty_events, ["user_id"], "ts", ["value"]).count() == 0
    assert asof_join(
        empty_events.select("user_id", F.col("ts").alias("t"), "value"),
        empty_events.select("user_id", F.col("ts").alias("t"),
                            F.col("value").alias("rv")),
        on="t", keys=["user_id"],
    ).count() == 0


def test_theta_and_group_aggregate_empty(spark, empty_events):
    from druid_hadoop_utils_spark.functions.aggregators import group_aggregate

    out = group_aggregate(
        empty_events, ["event_type"],
        [{"type": "thetaSketch", "name": "u", "fieldName": "user_id"},
         {"type": "doubleSum", "name": "v", "fieldName": "value"}],
        time_column=None,
    )
    assert out.count() == 0
    # global (keyless) aggregation over empty input yields ONE row with
    # zero-ish aggregates, like SQL
    g = group_aggregate(
        empty_events, [],
        [{"type": "count", "name": "n"}],
        time_column=None,
    ).first()
    assert g.n == 0


def test_similarity_empty_guards(spark):
    from druid_hadoop_utils_spark.operators import similarity as S

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dim"):
        S.random_projection(empty)
    with pytest.raises(ValueError, match="no vectors"):
        S.kmeans_centroids(empty, n_cells=4)
    assert S.quantize_embeddings(empty).count() == 0


def test_search_timeseries_events_empty(spark, empty_docs, empty_events):
    from druid_hadoop_utils_spark.operators import timeseries as TS
    from druid_hadoop_utils_spark.operators.dedup import strip_duplicate_ngrams
    from druid_hadoop_utils_spark.operators.events import (
        cohort_retention, funnel_counts,
    )
    from druid_hadoop_utils_spark.operators.search import (
        bm25_topk, corpus_term_stats,
    )

    assert corpus_term_stats(empty_docs).count() == 0
    assert bm25_topk(empty_docs, ["anything"]).count() == 0
    assert strip_duplicate_ngrams(empty_docs).count() == 0
    # funnel on no events: zero users at every step, NULL conversion
    rows = funnel_counts(empty_events, ["view", "click"]).collect()
    assert [r["users"] for r in rows] == [0, 0]
    assert all(r["conversion"] is None for r in rows)
    assert cohort_retention(empty_events).count() == 0
    assert TS.smooth(empty_events, ["event_type"], "ts", "value").count() == 0
    assert TS.delta(empty_events, ["event_type"], "ts", "value").count() == 0
    assert TS.zscore_outliers(empty_events, ["event_type"], "value").count() == 0
