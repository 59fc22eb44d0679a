"""AggregatorFactory / PostAggregator grammar tests (SURVEY.md §2.5/§2.6).

Covers the two-phase protocol: non-finalizing partials (binary sketch state)
must survive a second merge and finalize to the same estimate — the parity
property of the reference's NonFinalizing → merge → Finalizing chain
(reference: NonFinalizingAggregatorFactoryAdapter.java:19-31,
DoubleFinalizingAggregatorFactoryAdapter.java:17-29)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.functions.aggregators import (
    agg_expr,
    group_aggregate,
    post_agg_expr,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = []
    for i in range(100):
        rows.append(Row(g="a" if i % 2 == 0 else "b", v=i, d=float(i) / 2,
                        user=f"u{i % 17}"))
    return spark.createDataFrame(rows)


def agg1(df, spec, **kw):
    name = spec.get("name") or spec.get("fieldName")
    return df.agg(agg_expr(spec, df.schema, **kw)).first()[name]


def test_count(df):
    assert agg1(df, {"type": "count", "name": "c"}) == 100


def test_long_sum(df):
    assert agg1(df, {"type": "longSum", "name": "s", "fieldName": "v"}) == sum(range(100))


def test_double_sum(df):
    assert agg1(df, {"type": "doubleSum", "name": "s", "fieldName": "d"}) == pytest.approx(
        sum(i / 2 for i in range(100))
    )


def test_min_max(df):
    assert agg1(df, {"type": "longMin", "name": "m", "fieldName": "v"}) == 0
    assert agg1(df, {"type": "longMax", "name": "m", "fieldName": "v"}) == 99
    assert agg1(df, {"type": "doubleMin", "name": "m", "fieldName": "d"}) == 0.0
    assert agg1(df, {"type": "doubleMax", "name": "m", "fieldName": "d"}) == 49.5


def test_long_sum_casts_doubles(df):
    # Druid longSum over a double column truncates to long per-row
    assert agg1(df, {"type": "longSum", "name": "s", "fieldName": "d"}) == sum(
        int(i / 2) for i in range(100)
    )


def test_hyper_unique_exact_at_small_cardinality(df):
    est = agg1(df, {"type": "hyperUnique", "name": "u", "fieldName": "user"})
    assert est == 17.0  # HLL is exact in sparse mode at this cardinality


def test_cardinality_single_field(df):
    est = agg1(df, {"type": "cardinality", "name": "u", "fieldNames": ["user"]})
    assert est == 17.0


def test_cardinality_multi_field_union(df):
    est = agg1(df, {"type": "cardinality", "name": "u", "fieldNames": ["user", "g"]})
    assert est == 19.0  # 17 users ∪ 2 groups


def test_cardinality_by_row(df):
    est = agg1(df, {"type": "cardinality", "name": "u", "fieldNames": ["g", "user"],
                    "byRow": True})
    assert est == 34.0  # each (g, user) pair distinct


def test_filtered_aggregator(df):
    spec = {
        "type": "filtered",
        "name": "s",
        "filter": {"type": "selector", "dimension": "g", "value": "a"},
        "aggregator": {"type": "longSum", "name": "s", "fieldName": "v"},
    }
    assert agg1(df, spec) == sum(i for i in range(100) if i % 2 == 0)


def test_filtered_count(df):
    spec = {
        "type": "filtered",
        "name": "c",
        "filter": {"type": "selector", "dimension": "g", "value": "b"},
        "aggregator": {"type": "count", "name": "c"},
    }
    assert agg1(df, spec) == 50


def test_javascript_rejected(df):
    with pytest.raises(NotImplementedError):
        agg_expr({"type": "javascript", "name": "j"}, df.schema)


def test_two_phase_partial_then_merge_matches_direct(df):
    """Non-finalized partials re-merged must equal the one-shot estimate —
    the core two-phase property (SURVEY.md §2.5 A3/A4)."""
    partial = df.groupBy("g").agg(
        agg_expr({"type": "hyperUnique", "name": "u", "fieldName": "user"},
                 df.schema, finalize=False)
    )
    assert dict(partial.dtypes)["u"] == "binary"
    remerged = partial.agg(
        agg_expr({"type": "hyperUnique", "name": "u", "fieldName": "u"},
                 partial.schema, finalize=True)
    ).first().u
    direct = agg1(df, {"type": "hyperUnique", "name": "u", "fieldName": "user"})
    assert remerged == direct == 17.0


def test_post_agg_arithmetic_avg(df):
    out = group_aggregate(
        df,
        ["g"],
        [{"type": "doubleSum", "name": "s", "fieldName": "d"},
         {"type": "count", "name": "c"}],
        [{"type": "arithmetic", "name": "avg", "fn": "/",
          "fields": [{"type": "fieldAccess", "fieldName": "s"},
                     {"type": "fieldAccess", "fieldName": "c"}]}],
        time_column=None,
    )
    rows = {r.g: r for r in out.collect()}
    assert rows["a"].avg == pytest.approx(rows["a"].s / rows["a"].c)


def test_post_agg_divide_by_zero_is_zero(spark):
    df = spark.createDataFrame([Row(a=1.0, b=0.0)])
    out = df.select(post_agg_expr({
        "type": "arithmetic", "name": "r", "fn": "/",
        "fields": [{"type": "fieldAccess", "fieldName": "a"},
                   {"type": "fieldAccess", "fieldName": "b"}],
    })).first().r
    assert out == 0.0  # Druid's "/" semantics


def test_post_agg_quotient_is_plain_division(spark):
    df = spark.createDataFrame([Row(a=1.0, b=0.0)])
    out = df.select(post_agg_expr({
        "type": "arithmetic", "name": "r", "fn": "quotient",
        "fields": [{"type": "fieldAccess", "fieldName": "a"},
                   {"type": "fieldAccess", "fieldName": "b"}],
    })).first().r
    assert out == float("inf")  # IEEE double division, Druid quotient


def test_post_agg_constant_and_nested(spark):
    df = spark.createDataFrame([Row(x=10.0)])
    out = df.select(post_agg_expr({
        "type": "arithmetic", "name": "r", "fn": "*",
        "fields": [
            {"type": "constant", "value": 3},
            {"type": "arithmetic", "fn": "+",
             "fields": [{"type": "fieldAccess", "fieldName": "x"},
                        {"type": "constant", "value": 5}]},
        ],
    })).first().r
    assert out == 45.0


def test_hyper_unique_cardinality_post_agg(df):
    partial = df.groupBy("g").agg(
        agg_expr({"type": "hyperUnique", "name": "u", "fieldName": "user"},
                 df.schema, finalize=False)
    )
    out = partial.select("g", post_agg_expr(
        {"type": "hyperUniqueCardinality", "name": "est", "fieldName": "u"}
    )).collect()
    assert all(r.est == 17.0 for r in out)


def test_first_last_aggregators(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.functions.aggregators import group_aggregate

    df = spark.createDataFrame([
        Row(__time=datetime(2024, 1, 1, h), g="a", v=float(h * 10), u=h)
        for h in (3, 1, 2)
    ])
    out = group_aggregate(
        df, ["g"],
        [{"type": "longFirst", "name": "fu", "fieldName": "u"},
         {"type": "longLast", "name": "lu", "fieldName": "u"},
         {"type": "doubleFirst", "name": "fv", "fieldName": "v"},
         {"type": "doubleLast", "name": "lv", "fieldName": "v"}],
        time_column=None,
    ).first()
    assert (out.fu, out.lu, out.fv, out.lv) == (1, 3, 10.0, 30.0)
