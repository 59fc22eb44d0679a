"""Time-series post-processing (smooth/delta/zscore) semantics."""

from datetime import datetime

import pytest

from druid_hadoop_utils_spark.operators import timeseries as TS


def _series(spark, rows):
    return spark.createDataFrame(rows, ["k", "h", "v"])


T = datetime


@pytest.fixture(scope="module")
def series(spark):
    rows = [
        ("a", T(2024, 1, 1, 0), 10.0),
        ("a", T(2024, 1, 1, 1), 20.0),
        ("a", T(2024, 1, 1, 2), 30.0),
        ("a", T(2024, 1, 1, 3), 100.0),
        ("b", T(2024, 1, 1, 0), 5.0),
    ]
    return _series(spark, rows)


def test_smooth_trailing_partial_head(series):
    out = {(r["k"], r["h"]): r["moving_avg"]
           for r in TS.smooth(series, ["k"], "h", "v", preceding=2).collect()}
    assert out[("a", T(2024, 1, 1, 0))] == 10.0
    assert out[("a", T(2024, 1, 1, 1))] == 15.0
    assert out[("a", T(2024, 1, 1, 2))] == 20.0
    assert out[("a", T(2024, 1, 1, 3))] == 50.0
    assert out[("b", T(2024, 1, 1, 0))] == 5.0


def test_delta_null_at_head(series):
    out = {(r["k"], r["h"]): r["delta"]
           for r in TS.delta(series, ["k"], "h", "v").collect()}
    assert out[("a", T(2024, 1, 1, 0))] is None
    assert out[("a", T(2024, 1, 1, 1))] == 10.0
    assert out[("a", T(2024, 1, 1, 3))] == 70.0
    assert out[("b", T(2024, 1, 1, 0))] is None


def test_zscore_flags_outlier(series):
    out = {(r["k"], r["h"]): r for r in
           TS.zscore_outliers(series, ["k"], "v", threshold=1.4).collect()}
    # series a: mean 40, pop-std ~= 35.355 -> z(100) ~= 1.697
    assert out[("a", T(2024, 1, 1, 3))]["zscore"] == pytest.approx(1.697056, abs=1e-5)
    assert out[("a", T(2024, 1, 1, 3))]["is_outlier"] is True
    assert out[("a", T(2024, 1, 1, 0))]["is_outlier"] is False
    # single-point series: zero variance -> NULL z, not-outlier
    assert out[("b", T(2024, 1, 1, 0))]["zscore"] is None
    assert out[("b", T(2024, 1, 1, 0))]["is_outlier"] is False


def test_keyless_series(spark):
    rows = [("x", T(2024, 1, 1, h), float(h)) for h in range(4)]
    df = _series(spark, rows).drop("k")
    out = TS.smooth(df, [], "h", "v", preceding=1).collect()
    got = {r["h"]: r["moving_avg"] for r in out}
    assert got[T(2024, 1, 1, 3)] == 2.5


def test_composed_plan_single_exchange(series):
    out = TS.zscore_outliers(
        TS.delta(TS.smooth(series, ["k"], "h", "v"), ["k"], "h", "v"),
        ["k"], "v",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # all three window families partition on the series key: one exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_mad_outliers_robust_to_the_outlier(spark):
    # series: nine 10s and one 1000 — the classic case where mean/std
    # z-scores move with the outlier but median/MAD do not
    rows = [("a", T(2024, 1, 1, h), 10.0 + h * 0.1) for h in range(9)]
    rows.append(("a", T(2024, 1, 1, 23), 1000.0))
    df = _series(spark, rows)
    out = {r["h"]: r for r in
           TS.mad_outliers(df, ["k"], "v").collect()}
    assert out[T(2024, 1, 1, 23)]["is_outlier"] is True
    assert all(not out[T(2024, 1, 1, h)]["is_outlier"] for h in range(9))


def test_mad_zero_variance_null(spark):
    rows = [("a", T(2024, 1, 1, h), 5.0) for h in range(4)]
    out = TS.mad_outliers(_series(spark, rows), ["k"], "v").collect()
    assert all(r["mad_z"] is None and r["is_outlier"] is False for r in out)


def test_mad_matches_hand_computation(spark):
    vals = [1.0, 2.0, 3.0, 4.0, 100.0]
    rows = [("a", T(2024, 1, 1, i), v) for i, v in enumerate(vals)]
    out = {r["v"]: r["mad_z"] for r in
           TS.mad_outliers(_series(spark, rows), ["k"], "v").collect()}
    # median 3, deviations [2,1,0,1,97] -> MAD 1
    assert out[100.0] == pytest.approx(0.6745 * 97, abs=1e-6)
    assert out[3.0] == pytest.approx(0.0, abs=1e-9)


def test_mad_single_exchange(spark):
    rows = [("a", T(2024, 1, 1, h), float(h)) for h in range(5)]
    plan = TS.mad_outliers(_series(spark, rows), ["k"], "v") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
