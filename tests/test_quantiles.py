"""Mergeable histogram quantile sketch: two-phase parity + accuracy."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.functions.quantiles import (
    approx_quantiles,
    qhist_merge,
    qhist_quantile,
    qhist_state,
)


@pytest.fixture(scope="module")
def values(spark):
    # 0..999 uniformly
    return spark.range(1000).select((F.col("id")).cast("double").alias("v"),
                                    (F.col("id") % 4).alias("g"))


def test_quantile_accuracy_within_bin_width(values):
    out = approx_quantiles(values, "v", [], [0.5, 0.9, 0.99], lo=0, hi=1000, bins=100)
    row = out.first()
    assert row.p50 == pytest.approx(500, abs=10)  # bin width = 10
    assert row.p90 == pytest.approx(900, abs=10)
    assert row.p99 == pytest.approx(990, abs=10)


def test_two_phase_merge_equals_direct(values):
    """Partial states per group re-merged must finalize identically to the
    one-shot aggregate — the A3/A4 property for this sketch."""
    partial = values.groupBy("g").agg(qhist_state("v", 0, 1000, 100).alias("st"))
    merged = partial.agg(qhist_merge("st", 100).alias("st")).select(
        qhist_quantile("st", 0.5, 0, 1000, 100).alias("p50")
    ).first().p50
    direct = values.agg(qhist_state("v", 0, 1000, 100).alias("st")).select(
        qhist_quantile("st", 0.5, 0, 1000, 100).alias("p50")
    ).first().p50
    assert merged == direct


def test_out_of_range_clamps(spark):
    df = spark.createDataFrame([Row(v=-50.0), Row(v=-10.0), Row(v=5000.0)])
    out = df.agg(qhist_state("v", 0, 1000, 10).alias("st")).select(
        qhist_quantile("st", 0.25, 0, 1000, 10).alias("lo_q"),
        qhist_quantile("st", 0.99, 0, 1000, 10).alias("hi_q"),
    ).first()
    assert out.lo_q == 0.0    # underflow bucket → lo
    assert out.hi_q == 1000.0  # overflow bucket → hi


def test_empty_input_yields_null(spark):
    df = spark.createDataFrame([], "v double")
    out = df.agg(qhist_state("v", 0, 100, 10).alias("st")).select(
        qhist_quantile("st", 0.5, 0, 100, 10).alias("p50")
    ).first()
    assert out.p50 is None


def test_grouped_quantiles(values):
    out = approx_quantiles(values, "v", ["g"], [0.5], lo=0, hi=1000, bins=100)
    rows = {r.g: r.p50 for r in out.collect()}
    assert len(rows) == 4
    for g, p in rows.items():
        assert p == pytest.approx(500, abs=20)
