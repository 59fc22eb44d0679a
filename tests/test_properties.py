"""Property-based checks (SURVEY.md §5): the overshadow timeline and
granularity semantics hold under arbitrary inputs, not just fixtures.

The timeline properties run pure-Python (fast, hundreds of examples); the
granularity check batches many random timestamps into one Spark job and
verifies bucket invariants vectorized.
"""

from datetime import datetime, timedelta, timezone

import pytest
from hypothesis import given, settings, strategies as st

from druid_hadoop_utils_spark.intervals import Interval
from druid_hadoop_utils_spark.sources.segments import (
    SegmentManifest,
    resolve_visible_windows,
)

BASE = datetime(2014, 1, 1, tzinfo=timezone.utc)


def hours(n: int) -> datetime:
    return BASE + timedelta(hours=n)


segments_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),  # start hour
        st.integers(min_value=1, max_value=12),  # duration hours
        st.integers(min_value=0, max_value=5),  # version
        st.integers(min_value=1, max_value=3),  # shards in this publish
    ),
    min_size=1,
    max_size=12,
)


def build(segs):
    # each entry expands to `n` shard manifests of one (interval, version)
    # chunk — what a multi-shard group manifest registers; all shards are
    # visible together
    out = []
    for i, (s, d, v, n) in enumerate(segs):
        for shard in range(n):
            out.append(
                SegmentManifest("ds", Interval(hours(s), hours(s + d)),
                                f"v{v}", shard, f"/p/{i}/{shard}")
            )
    return out


QUERY = Interval(hours(0), hours(48))


@settings(max_examples=200, deadline=None)
@given(segments_strategy)
def test_timeline_windows_disjoint_and_clipped(segs):
    out = resolve_visible_windows(build(segs), QUERY)
    all_windows = [(w.manifest, win) for w in out for win in w.windows]
    for m, win in all_windows:
        assert QUERY.covers(win)
        assert m.interval.covers(win)
    # windows are disjoint across distinct (interval, version) groups;
    # shards of the same group legitimately share identical windows
    groups: dict[tuple, list] = {}
    for m, win in all_windows:
        groups.setdefault((m.interval, m.version), []).append(win)
    reps = sorted({win for wins in groups.values() for win in wins})
    for a, b in zip(reps, reps[1:]):
        if a != b:
            assert a.end <= b.start or a == b, f"overlapping windows {a} {b}"


@settings(max_examples=200, deadline=None)
@given(segments_strategy)
def test_timeline_max_version_wins_everywhere(segs):
    manifests = build(segs)
    out = resolve_visible_windows(manifests, QUERY)
    for w in out:
        for win in w.windows:
            mid = win.start + (win.end - win.start) / 2
            covering = [m for m in manifests if m.interval.contains_point(mid)]
            best = max(m.version for m in covering)
            assert w.manifest.version == best


@settings(max_examples=200, deadline=None)
@given(segments_strategy)
def test_timeline_full_coverage_no_gaps(segs):
    """Every instant covered by ANY segment inside the query interval must
    be covered by exactly one visible window."""
    manifests = build(segs)
    out = resolve_visible_windows(manifests, QUERY)
    # sample instants on a half-hour grid
    for k in range(0, 96):
        t = hours(0) + timedelta(minutes=30 * k) + timedelta(minutes=1)
        if t >= QUERY.end:
            break
        covered_by_input = any(m.interval.contains_point(t) for m in manifests)
        visible = [
            w for w in out for win in w.windows if win.contains_point(t)
        ]
        if covered_by_input:
            versions = {w.manifest.version for w in visible}
            assert len(versions) == 1, f"instant {t} sees versions {versions}"
        else:
            assert not visible


@settings(max_examples=200, deadline=None)
@given(segments_strategy)
def test_timeline_shards_visible_together(segs):
    """Every shard of a visible (interval, version) chunk is visible with
    IDENTICAL windows — the invariant that makes a multi-shard group
    manifest an atomic replace unit."""
    manifests = build(segs)
    out = resolve_visible_windows(manifests, QUERY)
    windows_by_manifest = {w.manifest: w.windows for w in out}
    chunks: dict[tuple, list[SegmentManifest]] = {}
    for m in manifests:
        chunks.setdefault((m.interval, m.version), []).append(m)
    for members in chunks.values():
        member_windows = {windows_by_manifest.get(m) for m in members}
        assert len(member_windows) == 1, (
            f"shards of one chunk diverged: {member_windows}"
        )


@pytest.mark.parametrize("gran,align_secs,calendar", [
    ("SECOND", 1, None), ("MINUTE", 60, None), ("FIVE_MINUTE", 300, None),
    ("FIFTEEN_MINUTE", 900, None), ("HOUR", 3600, None), ("SIX_HOUR", 21600, None),
    ("DAY", 86400, None), ("WEEK", None, "week"), ("MONTH", None, "month"),
    ("YEAR", None, "year"),
])
def test_granularity_bucket_invariants_batch(spark, gran, align_secs, calendar):
    """For 2000 random timestamps: trunc(t) <= t < trunc(t)+unit and
    trunc(t) is aligned — one Spark job per granularity."""
    from pyspark.sql import functions as F

    from druid_hadoop_utils_spark.functions.granularity import granularity_expr

    df = (
        spark.range(2000)
        .select(
            F.timestamp_seconds(
                (F.xxhash64("id") % (40 * 365 * 86400)).cast("long") + 86400 * 365 * 10
            ).alias("t")
        )
        .select("t", granularity_expr(gran, F.col("t")).alias("b"))
    )
    bad_order = df.where((F.col("b") > F.col("t"))).count()
    assert bad_order == 0
    if align_secs is not None:
        misaligned = df.where(F.unix_timestamp("b") % align_secs != 0).count()
        assert misaligned == 0
        too_far = df.where(
            F.unix_timestamp("t") - F.unix_timestamp("b") >= align_secs
        ).count()
        assert too_far == 0
    else:
        # calendar units: re-truncating the bucket is a fixpoint
        redo = df.where(F.date_trunc(calendar, F.col("b")) != F.col("b")).count()
        assert redo == 0
