"""Funnel and cohort-retention semantics on hand-built event streams."""

from datetime import datetime

import pytest

from druid_hadoop_utils_spark.operators.events import (
    cohort_retention,
    funnel_counts,
    funnel_times,
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts", "event_type"])


T = datetime


@pytest.fixture(scope="module")
def stream(spark):
    rows = [
        # u1 completes view -> click -> buy in order
        (1, T(2024, 1, 1, 0), "view"),
        (1, T(2024, 1, 1, 1), "click"),
        (1, T(2024, 1, 1, 2), "buy"),
        # u2 clicks BEFORE viewing: chain breaks at click
        (2, T(2024, 1, 1, 1), "click"),
        (2, T(2024, 1, 1, 2), "view"),
        (2, T(2024, 1, 1, 3), "buy"),
        # u3 views only
        (3, T(2024, 1, 1, 0), "view"),
        # u4 never views (not in funnel at all)
        (4, T(2024, 1, 1, 0), "click"),
        (4, T(2024, 1, 1, 1), "buy"),
    ]
    return _ev(spark, rows)


def test_funnel_times_ordered_chain(stream):
    out = {r["user_id"]: r for r in
           funnel_times(stream, ["view", "click", "buy"]).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["t1"] == T(2024, 1, 1, 0)
    assert out[1]["t2"] == T(2024, 1, 1, 1)
    assert out[1]["t3"] == T(2024, 1, 1, 2)
    # u2: view at 2, no click after 2 -> chain breaks, t3 NULL even
    # though a buy exists after the view
    assert out[2]["t1"] == T(2024, 1, 1, 2)
    assert out[2]["t2"] is None
    assert out[2]["t3"] is None
    assert out[3]["t2"] is None and out[3]["t3"] is None


def test_funnel_broken_chain_keeps_row(stream):
    # regression: a user with t1 but no valid later step must keep a row
    # with NULLs, not vanish from the frame
    assert funnel_times(stream, ["view", "click", "buy"]).count() == 3


def test_funnel_counts_and_conversion(stream):
    rows = funnel_counts(stream, ["view", "click", "buy"]).collect()
    got = {r["step"]: (r["users"], r["conversion"]) for r in rows}
    assert got["view"] == (3, 1.0)
    assert got["click"] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert got["buy"] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert [r["step_idx"] for r in rows] == [1, 2, 3]


def test_funnel_greedy_earliest(spark):
    # two views: the EARLIEST is chosen, which admits the later click
    rows = [
        (1, T(2024, 1, 1, 0), "view"),
        (1, T(2024, 1, 1, 5), "view"),
        (1, T(2024, 1, 1, 3), "click"),
    ]
    out = funnel_times(_ev(spark, rows), ["view", "click"]).collect()[0]
    assert out["t1"] == T(2024, 1, 1, 0)
    assert out["t2"] == T(2024, 1, 1, 3)


def test_funnel_requires_two_steps(stream):
    with pytest.raises(ValueError):
        funnel_times(stream, ["view"])


def test_cohort_retention_weekly(spark):
    rows = [
        # u1 first seen week of Jan 1 (Mon), active weeks 0 and 2
        (1, T(2024, 1, 2), "a"),
        (1, T(2024, 1, 16), "a"),
        # u2 same cohort, active week 0 only (two events, one period)
        (2, T(2024, 1, 3), "a"),
        (2, T(2024, 1, 4), "a"),
        # u3 cohort of Jan 8, active weeks 0 and 1
        (3, T(2024, 1, 9), "a"),
        (3, T(2024, 1, 15), "a"),
    ]
    out = {(str(r["cohort"]), r["offset"]): r["users"]
           for r in cohort_retention(_ev(spark, rows)).collect()}
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
        ("2024-01-08", 1): 1,
    }


def test_cohort_retention_monthly_offsets(spark):
    rows = [
        (1, T(2024, 1, 20), "a"),
        (1, T(2024, 3, 2), "a"),
    ]
    out = {(str(r["cohort"]), r["offset"]): r["users"]
           for r in cohort_retention(_ev(spark, rows), period="month").collect()}
    # calendar-month arithmetic: Jan -> Mar is offset 2 regardless of days
    assert out == {("2024-01-01", 0): 1, ("2024-01-01", 2): 1}


def test_cohort_max_offset_clips(spark):
    rows = [
        (1, T(2024, 1, 1), "a"),
        (1, T(2024, 2, 19), "a"),
    ]
    out = cohort_retention(_ev(spark, rows), max_offset=3).collect()
    assert {r["offset"] for r in out} == {0}


def test_funnel_within_horizon(spark):
    rows = [
        (1, T(2024, 1, 1, 0), "view"),
        (1, T(2024, 1, 1, 5), "click"),     # 5h after step 1
        (2, T(2024, 1, 1, 0), "view"),
        (2, T(2024, 1, 1, 1), "click"),     # 1h after step 1
    ]
    out = {r["user_id"]: r["t2"] for r in funnel_times(
        _ev(spark, rows), ["view", "click"], within_seconds=2 * 3600).collect()}
    assert out[1] is None          # outside the 2h horizon
    assert out[2] == T(2024, 1, 1, 1)


def _py_funnel(events, steps, within=None):
    """Brute-force reference: per user, chained earliest-valid mins."""
    users = {}
    for u, t, ty in events:
        users.setdefault(u, {}).setdefault(ty, []).append(t)
    out = {}
    for u, by_step in users.items():
        t1_cands = by_step.get(steps[0], [])
        if not t1_cands:
            continue
        times = [min(t1_cands)]
        deadline = None if within is None else times[0] + within
        for s in steps[1:]:
            prev = times[-1]
            if prev is None:
                times.append(None)
                continue
            cands = [
                t for t in by_step.get(s, [])
                if t > prev and (deadline is None or t <= deadline)
            ]
            times.append(min(cands) if cands else None)
        out[u] = times
    return out


@pytest.mark.parametrize("seed,within", [(0, None), (1, None), (2, 3600),
                                         (3, 7200), (4, 60)])
def test_funnel_matches_bruteforce_random(spark, seed, within):
    import datetime
    import random

    rng = random.Random(seed)
    base = T(2024, 1, 1)
    types = ["a", "b", "c", "noise"]
    # distinct timestamps (second granularity, no collisions) keep the
    # comparison tie-free on both sides
    ticks = rng.sample(range(200000), 300)
    rows = [
        (rng.randrange(20), base + datetime.timedelta(seconds=s),
         rng.choice(types))
        for s in ticks
    ]
    steps = ["a", "b", "c"]
    want = _py_funnel(rows, steps,
                      None if within is None
                      else datetime.timedelta(seconds=within))
    got = {
        r["user_id"]: [r["t1"], r["t2"], r["t3"]]
        for r in funnel_times(_ev(spark, rows), steps,
                              within_seconds=within).collect()
    }
    assert got == want


def test_event_transitions_counts(spark):
    from druid_hadoop_utils_spark.operators.events import event_transitions

    rows = [
        (1, T(2024, 1, 1, 0), "a"),
        (1, T(2024, 1, 1, 1), "b"),
        (1, T(2024, 1, 1, 2), "a"),
        (2, T(2024, 1, 1, 0), "a"),
        (2, T(2024, 1, 1, 1), "b"),
        (3, T(2024, 1, 1, 5), "c"),   # single event: no transition
    ]
    out = {(r["from_type"], r["to_type"]): (r["n"], r["n_users"])
           for r in event_transitions(_ev(spark, rows)).collect()}
    assert out == {("a", "b"): (2, 2), ("b", "a"): (1, 1)}


def test_event_transitions_no_cross_user_pairs(spark):
    from druid_hadoop_utils_spark.operators.events import event_transitions

    rows = [(1, T(2024, 1, 1, 0), "a"), (2, T(2024, 1, 1, 1), "b")]
    assert event_transitions(_ev(spark, rows)).count() == 0


def test_stickiness_hand_computed(spark):
    from druid_hadoop_utils_spark.operators.events import stickiness

    # week of Jan 1: u1 active Mon+Tue, u2 active Mon -> DAU [2, 1],
    # avg 1.5; WAU 2 -> stickiness 0.75
    rows = [
        (1, T(2024, 1, 1, 9), "a"),
        (1, T(2024, 1, 2, 9), "a"),
        (1, T(2024, 1, 2, 15), "a"),   # same day twice: still one DAU unit
        (2, T(2024, 1, 1, 20), "a"),
    ]
    out = stickiness(_ev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["dau_avg"] == 1.5 and r["wau"] == 2 and r["stickiness"] == 0.75


def test_funnel_counts_step_name_with_quote(spark):
    rows = [
        (1, T(2024, 1, 1, 0), "add'l info"),
        (1, T(2024, 1, 1, 1), "buy"),
    ]
    out = {r["step"]: r["users"] for r in
           funnel_counts(_ev(spark, rows), ["add'l info", "buy"]).collect()}
    assert out == {"add'l info": 1, "buy": 1}
