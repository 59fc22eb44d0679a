"""DML × materialized rollups (VERDICT r10 item 5, carried from r8).

The composition contract: a merge/update/delete rewrites the affected
buckets under fresh segment identifiers, so those buckets' rollup
states go MISSING (never stale) — ``query_materialized`` and the
transparent rewrite refuse LOUDLY naming the catch-up, and
``materialize_aggs`` catches up INCREMENTALLY (it computes states only
for the new segments, never re-reading untouched buckets). After
catch-up the states-only answer equals the raw scan again.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark import load
from druid_hadoop_utils_spark.sources.dml import delete_where, merge_into
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.materialize import (
    RewriteMiss,
    materialize_aggs,
    query_materialized,
    rewrite_groupby_from_states,
)

SPEC = {"granularity": "NONE", "dimensions": ["k"],
        "metrics": [{"name": "v", "type": "double"}]}
AGGS = [{"type": "doubleSum", "name": "v_sum", "fieldName": "v"}]


@pytest.fixture
def root(tmp_path, spark):
    r = str(tmp_path / "tbl")
    rows = [Row(ts=datetime(2024, 1, 1 + d, h), k=f"k{h}",
                v=float(d * 10 + h)) for d in range(3) for h in (1, 2, 3)]
    publish_segments(spark.createDataFrame(rows), r, "t", version="v1",
                     time_column="ts", bucket="DAY")
    done = materialize_aggs(spark, r, "t", "daily", ["k"], AGGS,
                            granularity="DAY")
    assert len(done) == 3  # one state per day segment
    return r


def _raw_rollup(spark, root):
    df = load(spark, root, SPEC, interval="2024-01-01/2024-02-01",
              data_source="t")
    return sorted(
        (r["k"], round(r["s"], 3))
        for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()
    )


def _mat_rollup(spark, root):
    # states keep the per-bucket __time — fold it away so the compare is
    # per-key totals like the raw side
    out = query_materialized(spark, root, "t", "daily")
    totals: dict[str, float] = {}
    for r in out.collect():
        totals[r["k"]] = totals.get(r["k"], 0.0) + r["v_sum"]
    return sorted((k, round(v, 3)) for k, v in totals.items())


def test_merge_then_materialized_refuses_until_catchup(spark, root):
    assert _mat_rollup(spark, root) == _raw_rollup(spark, root)

    merge_into(spark, root, "t",
               spark.createDataFrame(
                   [Row(__time=datetime(2024, 1, 2, 1), k="k1", v=500.0)]),
               ["k"])

    # the affected bucket's new segment has no state → LOUD refusal
    # naming the catch-up, never a stale answer
    with pytest.raises(FileNotFoundError, match="materialize_aggs"):
        query_materialized(spark, root, "t", "daily")

    # catch-up is incremental: ONLY the merged day's new segment
    done = materialize_aggs(spark, root, "t", "daily", ["k"], AGGS,
                            granularity="DAY")
    assert len(done) == 1
    assert "2024-01-02" in done[0]

    assert _mat_rollup(spark, root) == _raw_rollup(spark, root)


def test_delete_then_materialized_refuses_until_catchup(spark, root):
    # partial delete rewrites day 3 under a new version
    delete_where(spark, root, "t",
                 {"type": "selector", "dimension": "k", "value": "k1"},
                 interval="2024-01-03/2024-01-04")
    with pytest.raises(FileNotFoundError, match="materialize_aggs"):
        query_materialized(spark, root, "t", "daily")
    done = materialize_aggs(spark, root, "t", "daily", ["k"], AGGS,
                            granularity="DAY")
    assert len(done) == 1
    assert _mat_rollup(spark, root) == _raw_rollup(spark, root)


def test_full_bucket_delete_tombstones_without_catchup(spark, root):
    """Deleting EVERY row of a bucket tombstones it — tombstones carry
    no state, so the states-only answer needs no catch-up at all."""
    delete_where(spark, root, "t",
                 {"type": "regex", "dimension": "k", "pattern": "k.*"},
                 interval="2024-01-01/2024-01-02")
    assert _mat_rollup(spark, root) == _raw_rollup(spark, root)


def test_transparent_rewrite_misses_after_dml_then_hits(spark, root):
    q = dict(dimensions=["k"], aggregations=AGGS, granularity="DAY",
             intervals="2024-01-01/2024-01-04")
    hit = rewrite_groupby_from_states(spark, root, "t", **q)
    assert hit is not None

    merge_into(spark, root, "t",
               spark.createDataFrame(
                   [Row(__time=datetime(2024, 1, 2, 1), k="k1", v=500.0)]),
               ["k"])

    # after DML the rewrite must MISS (fall back to the raw scan), and
    # require=True must name the reason loudly — never a stale answer
    assert rewrite_groupby_from_states(spark, root, "t", **q) is None
    with pytest.raises(RewriteMiss):
        rewrite_groupby_from_states(spark, root, "t", require=True, **q)

    materialize_aggs(spark, root, "t", "daily", ["k"], AGGS,
                     granularity="DAY")
    hit2 = rewrite_groupby_from_states(spark, root, "t", **q)
    assert hit2 is not None
    raw = load(spark, root, SPEC, interval="2024-01-01/2024-01-04",
               data_source="t")
    raw_agg = sorted(
        (r["__time"].isoformat(), r["k"], round(r["s"], 3))
        for r in raw.groupBy(
            F.date_trunc("day", "__time").alias("__time"), "k")
        .agg(F.sum("v").alias("s")).collect())
    mat_agg = sorted(
        (r["__time"].isoformat(), r["k"], round(r["v_sum"], 3))
        for r in hit2.collect())
    assert mat_agg == raw_agg
