"""Optimistic concurrency for row-level DML (VERDICT r8 item 1) and the
read-modify-write maintenance ops (item 3).

The contract under test: every DML op re-validates the affected buckets'
VISIBLE timeline at commit time under the table's commit lease, and
refuses (``ConcurrentWriteConflict``) when it changed since the entry
read — both-succeed-with-silent-loss must be impossible. The check is
per-affected-bucket, so non-overlapping writers never conflict; and it
is a function of the logical visible timeline, so visibility-preserving
maintenance (compact_manifests, vacuum) never causes a false refusal.

Two layers: deterministic in-process interleavings via the
``_pre_commit_hook`` seam (cheap, covers every op), and a REAL
two-process race (spawn, own SparkSession each, barrier-aligned at the
commit point) where exactly one merge must win.
"""

from __future__ import annotations

import multiprocessing as mp
import os
from datetime import datetime

import pytest
from pyspark.sql import Row

from druid_hadoop_utils_spark import load
from druid_hadoop_utils_spark.sources.dml import (
    ConcurrentWriteConflict,
    delete_where,
    merge_into,
    update_where,
)
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.segments import list_manifests

SPEC = {"granularity": "NONE", "dimensions": ["k"],
        "metrics": [{"name": "v", "type": "double"}]}


@pytest.fixture(params=["local", "objectsim"])
def root(tmp_path, request, spark):
    r = (str(tmp_path / "tbl") if request.param == "local"
         else "objectsim://" + str(tmp_path / "tbl"))
    rows = [Row(ts=datetime(2024, 1, 1 + d, h), k=f"k{h}", v=float(d * 10 + h))
            for d in range(3) for h in (1, 2, 3)]
    publish_segments(spark.createDataFrame(rows), r, "t", version="v1",
                     time_column="ts", bucket="DAY")
    return r


def _rows(spark, root, as_of=None):
    df = load(spark, root, SPEC, interval="2024-01-01/2024-02-01",
              data_source="t", as_of=as_of)
    return sorted((r["__time"].isoformat(), r["k"], r["v"])
                  for r in df.collect())


def _ups(spark, day, hour, k, v):
    return spark.createDataFrame([Row(__time=datetime(2024, 1, day, hour),
                                      k=k, v=v)])


# ---------------------------------------------------------------------
# deterministic interleavings through the _pre_commit_hook seam
# ---------------------------------------------------------------------


def test_merge_conflicts_with_intervening_merge_same_bucket(spark, root):
    """Writer A computes its rewrite, writer B lands first → A refuses,
    B's changes survive, nothing of A is visible or on disk."""
    def b_lands_first():
        merge_into(spark, root, "t", _ups(spark, 1, 1, "k1", 111.0), ["k"])

    with pytest.raises(ConcurrentWriteConflict, match="2024-01-01"):
        merge_into(spark, root, "t", _ups(spark, 1, 1, "k1", 999.0), ["k"],
                   _pre_commit_hook=b_lands_first)
    after = dict(((t, k), v) for t, k, v in _rows(spark, root))
    assert after[("2024-01-01T01:00:00", "k1")] == 111.0  # B won, not lost
    assert 999.0 not in after.values()  # nothing of A leaked


def test_merge_conflict_cleans_staged_dirs_and_manifests(spark, root):
    from druid_hadoop_utils_spark.sources.fs import get_fs

    def b_lands_first():
        merge_into(spark, root, "t", _ups(spark, 1, 1, "k1", 111.0), ["k"])

    before_versions = {m.version for m in list_manifests(root, "t")}
    with pytest.raises(ConcurrentWriteConflict):
        merge_into(spark, root, "t", _ups(spark, 1, 1, "k1", 999.0), ["k"],
                   _pre_commit_hook=b_lands_first)
    ms = list_manifests(root, "t")
    # exactly ONE new merge version (B's); A announced nothing
    new_versions = {m.version for m in ms} - before_versions
    assert len(new_versions) == 1
    # and A's staged segment dir was reclaimed: every dir under the
    # table belongs to a registered manifest or the v1 original.
    # Manifests store fs.spark_url() forms (file:// on objectsim) while
    # the walk below builds scheme-qualified fs paths — normalize BOTH
    # through the engine's own mapping (spark_url is idempotent), so the
    # comparison can't drift from backends with non-trivial URL schemes
    # (ADVICE r10).
    fs = get_fs(root)

    def canon(p):
        return fs.spark_url(p).rstrip("/")
    referenced = {canon(m.path) for m in ms if m.path}
    seg_parent = fs.join(root, "t")
    stray = []
    for name in fs.ls(seg_parent):
        if name.startswith("_"):
            continue
        d = fs.join(seg_parent, name)
        for sub in fs.ls(d):
            p = fs.join(d, sub).rstrip("/")
            cp = canon(p)
            # manifests reference shard-level leaves below the version
            # dir — a version dir is live iff some reference is under it
            if fs.isdir(p) and not any(
                    r == cp or r.startswith(cp + "/") for r in referenced):
                stray.append(p)
    assert stray == [], f"unreclaimed staged dirs: {stray}"


def test_merge_no_conflict_on_disjoint_buckets(spark, root):
    """Per-bucket fingerprint: a concurrent writer in a DIFFERENT bucket
    must not refuse this one — both succeed."""
    def b_other_bucket():
        merge_into(spark, root, "t", _ups(spark, 2, 1, "k1", 222.0), ["k"])

    merge_into(spark, root, "t", _ups(spark, 1, 1, "k1", 999.0), ["k"],
               _pre_commit_hook=b_other_bucket)
    after = dict(((t, k), v) for t, k, v in _rows(spark, root))
    assert after[("2024-01-01T01:00:00", "k1")] == 999.0
    assert after[("2024-01-02T01:00:00", "k1")] == 222.0


def test_delete_where_conflicts_with_intervening_publish(spark, root):
    def b_publishes():
        # plain re-ingest of day 1 under a fresh version (Druid replace)
        from druid_hadoop_utils_spark.sources.maintenance import next_version

        publish_segments(
            spark.createDataFrame([Row(ts=datetime(2024, 1, 1, 5),
                                       k="k5", v=5.0)]),
            root, "t", version=next_version(root, "t", prefix="reingest"),
            time_column="ts", bucket="DAY")

    with pytest.raises(ConcurrentWriteConflict):
        delete_where(spark, root, "t",
                     {"type": "selector", "dimension": "k", "value": "k1"},
                     interval="2024-01-01/2024-01-02",
                     _pre_commit_hook=b_publishes)
    # B's replace stands (day 1 is now just k5); nothing half-deleted
    after = [x for x in _rows(spark, root) if x[0].startswith("2024-01-01")]
    assert after == [("2024-01-01T05:00:00", "k5", 5.0)]


def test_update_where_conflicts_with_intervening_merge(spark, root):
    def b_lands_first():
        merge_into(spark, root, "t", _ups(spark, 1, 2, "k2", 777.0), ["k"])

    with pytest.raises(ConcurrentWriteConflict):
        update_where(spark, root, "t",
                     {"type": "selector", "dimension": "k", "value": "k1"},
                     {"v": "v + 1000"}, interval="2024-01-01/2024-01-02",
                     _pre_commit_hook=b_lands_first)
    after = dict(((t, k), v) for t, k, v in _rows(spark, root))
    assert after[("2024-01-01T02:00:00", "k2")] == 777.0  # B survived
    assert after[("2024-01-01T01:00:00", "k1")] == 1.0    # A never applied


def test_no_false_conflict_from_compact_manifests(spark, root):
    """compact_manifests rewrites manifest FILES, not the visible
    timeline — the fingerprint must not change (no spurious refusal)."""
    from druid_hadoop_utils_spark.sources.segments import compact_manifests

    merge_into(spark, root, "t", _ups(spark, 1, 1, "k1", 50.0), ["k"],
               _pre_commit_hook=lambda: compact_manifests(root, "t"))
    after = dict(((t, k), v) for t, k, v in _rows(spark, root))
    assert after[("2024-01-01T01:00:00", "k1")] == 50.0


def test_no_false_conflict_from_vacuum(spark, root):
    """vacuum removes only fully-overshadowed entries — visibility is
    unchanged, so a DML racing it must still commit."""
    from druid_hadoop_utils_spark.sources.maintenance import vacuum

    # create something for vacuum to reclaim: overshadow day 3 twice
    for v in (300.0, 301.0):
        merge_into(spark, root, "t", _ups(spark, 3, 1, "k1", v), ["k"])

    merge_into(spark, root, "t", _ups(spark, 1, 1, "k1", 60.0), ["k"],
               _pre_commit_hook=lambda: vacuum(root, "t"))
    after = dict(((t, k), v) for t, k, v in _rows(spark, root))
    assert after[("2024-01-01T01:00:00", "k1")] == 60.0
    assert after[("2024-01-03T01:00:00", "k1")] == 301.0


def test_merge_conflicts_with_retention_tombstone(spark, root):
    """A retention tombstone darkening an affected bucket between entry
    and commit is a conflict: the merge's survivors were computed from
    rows retention just dropped."""
    from druid_hadoop_utils_spark.sources.maintenance import apply_retention

    with pytest.raises(ConcurrentWriteConflict):
        merge_into(
            spark, root, "t", _ups(spark, 1, 1, "k1", 999.0), ["k"],
            _pre_commit_hook=lambda: apply_retention(
                root, "t", "2024-01-02T00:00:00"))
    assert not any(t.startswith("2024-01-01")
                   for t, _k, _v in _rows(spark, root))


def test_compact_segments_conflicts_with_intervening_dml(
        spark, root, monkeypatch):
    """Compaction is read-modify-write too: a merge landing while the
    compaction job runs must make the compaction refuse — otherwise the
    compacted rewrite of the PRE-merge rows would erase the merge."""
    from druid_hadoop_utils_spark.sources import maintenance as maint

    real_publish = maint.publish_segments
    fired = {"done": False}

    def racing_publish(*args, **kwargs):
        out = real_publish(*args, **kwargs)
        if not fired["done"]:
            fired["done"] = True
            merge_into(spark, root, "t", _ups(spark, 1, 1, "k1", 888.0),
                       ["k"])
        return out

    monkeypatch.setattr(maint, "publish_segments", racing_publish)
    with pytest.raises(ConcurrentWriteConflict):
        maint.compact_segments(spark, root, "t", "2024-01-01/2024-01-04")
    after = dict(((t, k), v) for t, k, v in _rows(spark, root))
    assert after[("2024-01-01T01:00:00", "k1")] == 888.0  # merge survived


def test_apply_retention_takes_maintenance_lease(root):
    from druid_hadoop_utils_spark.sources.lease import (
        MaintenanceLockHeld,
        maintenance_lease,
    )
    from druid_hadoop_utils_spark.sources.maintenance import apply_retention

    with maintenance_lease(root, "t", "vacuum"):
        with pytest.raises(MaintenanceLockHeld):
            apply_retention(root, "t", "2024-01-02T00:00:00")
        # dry_run is read-only: never blocked
        apply_retention(root, "t", "2024-01-02T00:00:00", dry_run=True)


def test_compact_segments_takes_maintenance_lease(spark, root):
    from druid_hadoop_utils_spark.sources.lease import (
        MaintenanceLockHeld,
        maintenance_lease,
    )
    from druid_hadoop_utils_spark.sources.maintenance import compact_segments

    with maintenance_lease(root, "t", "vacuum"):
        with pytest.raises(MaintenanceLockHeld):
            compact_segments(spark, root, "t", "2024-01-01/2024-01-04")


def test_commit_lease_waits_not_refuses(root):
    """The commit lease polls (commits are sub-second) instead of
    refusing like the maintenance lease."""
    import threading
    import time

    from druid_hadoop_utils_spark.sources.lease import commit_lease

    order = []

    def holder():
        with commit_lease(root, "t", "merge_into"):
            order.append("a-in")
            time.sleep(0.5)
            order.append("a-out")

    t = threading.Thread(target=holder)
    t.start()
    time.sleep(0.15)  # let the holder acquire
    with commit_lease(root, "t", "merge_into"):
        order.append("b-in")
    t.join()
    assert order == ["a-in", "a-out", "b-in"]


# ---------------------------------------------------------------------
# the real thing: two processes, own SparkSessions, barrier-aligned
# ---------------------------------------------------------------------


def _race_merge(root, who, value, day, barrier, out):
    """Child: own SparkSession, merge day-`day` k1 := value; barrier at
    the commit point so both children hold staged rewrites computed from
    the SAME entry state before either registers."""
    try:
        from druid_hadoop_utils_spark.session import get_spark
        from druid_hadoop_utils_spark.sources.dml import (
            ConcurrentWriteConflict as CWC,
        )
        from druid_hadoop_utils_spark.sources.dml import merge_into as mi

        spark = get_spark(f"dml-race-{who}", master="local[2]",
                          shuffle_partitions=2)
        spark.sparkContext.setLogLevel("ERROR")
        ups = spark.createDataFrame(
            [Row(__time=datetime(2024, 1, day, 1), k="k1", v=value)])
        try:
            mi(spark, root, "t", ups, ["k"],
               _pre_commit_hook=lambda: barrier.wait(timeout=120))
            out.put((who, "ok", value))
        except CWC as e:
            out.put((who, "conflict", str(e)[:120]))
        finally:
            spark.stop()
    except Exception as e:  # pragma: no cover - debugging aid
        out.put((who, f"ERROR:{type(e).__name__}", str(e)[:300]))


@pytest.mark.slow
def test_two_process_merge_race_same_bucket(tmp_path, spark):
    """VERDICT r8 item 1 'done' bar: two real processes race merge_into
    on the SAME bucket — exactly one succeeds, one refuses, and the
    final table state is the winner's merge applied exactly once."""
    root = str(tmp_path / "tbl")
    rows = [Row(ts=datetime(2024, 1, 1 + d, h), k=f"k{h}",
                v=float(d * 10 + h)) for d in range(3) for h in (1, 2, 3)]
    publish_segments(spark.createDataFrame(rows), root, "t", version="v1",
                     time_column="ts", bucket="DAY")

    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(2)
    out = ctx.Queue()
    ps = [ctx.Process(target=_race_merge,
                      args=(root, who, val, 1, barrier, out))
          for who, val in (("a", 111.0), ("b", 222.0))]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=300)
    results = [out.get(timeout=30) for _ in ps]
    outcomes = sorted(status for _w, status, _d in results)
    assert outcomes == ["conflict", "ok"], results  # EXACTLY one winner
    winner_val = next(d for _w, s, d in results if s == "ok")
    after = dict(((t, k), v) for t, k, v in _rows(spark, root))
    assert after[("2024-01-01T01:00:00", "k1")] == winner_val
    loser_val = 333.0 - winner_val
    assert loser_val not in after.values()  # silent loss impossible
    # loser left no dirs or manifests behind
    new_merge_versions = {m.version for m in list_manifests(root, "t")
                          if "merge" in m.version}
    assert len(new_merge_versions) == 1


@pytest.mark.slow
def test_two_process_merge_race_disjoint_buckets(tmp_path, spark):
    """Non-overlapping buckets: BOTH succeed (the fingerprint is
    per-affected-bucket, not table-global)."""
    root = str(tmp_path / "tbl")
    rows = [Row(ts=datetime(2024, 1, 1 + d, h), k=f"k{h}",
                v=float(d * 10 + h)) for d in range(3) for h in (1, 2, 3)]
    publish_segments(spark.createDataFrame(rows), root, "t", version="v1",
                     time_column="ts", bucket="DAY")

    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(2)
    out = ctx.Queue()
    ps = [ctx.Process(target=_race_merge,
                      args=(root, who, val, day, barrier, out))
          for who, val, day in (("a", 111.0, 1), ("b", 222.0, 2))]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=300)
    results = [out.get(timeout=30) for _ in ps]
    assert sorted(s for _w, s, _d in results) == ["ok", "ok"], results
    after = dict(((t, k), v) for t, k, v in _rows(spark, root))
    assert after[("2024-01-01T01:00:00", "k1")] == 111.0
    assert after[("2024-01-02T01:00:00", "k1")] == 222.0


# ---------------------------------------------------------------------
# every registration path serializes on the commit lease (VERDICT r10
# item 1): while the lease is held, no announcement can land — so none
# can land inside a DML commit's check+register window either
# ---------------------------------------------------------------------


def _wait_until(pred, timeout=60.0, interval=0.02):
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(interval)
    return False


def test_publish_segments_registers_under_commit_lease(spark, root):
    """A plain publish's REGISTRATION blocks behind a held commit lease;
    the data write/promote (outside the lease) proceeds regardless."""
    import threading
    import time

    from druid_hadoop_utils_spark.sources.fs import get_fs
    from druid_hadoop_utils_spark.sources.lease import commit_lease

    fs = get_fs(root)
    rows = [Row(ts=datetime(2024, 1, 4, h), k=f"k{h}", v=float(h))
            for h in (1, 2)]
    df = spark.createDataFrame(rows)

    def announced():
        return any(m.version == "v2" for m in list_manifests(root, "t"))

    with commit_lease(root, "t", "holder"):
        t = threading.Thread(target=lambda: publish_segments(
            df, root, "t", version="v2", time_column="ts", bucket="DAY"))
        t.start()
        # wait for the promote to finish (the version dir appears) —
        # after that the ONLY remaining step is registration
        from druid_hadoop_utils_spark.intervals import Interval
        from druid_hadoop_utils_spark.sources.segments import segment_dir

        vdir = fs.parent(segment_dir(
            root, "t", Interval.parse("2024-01-04/2024-01-05"), "v2"))
        assert _wait_until(lambda: fs.isdir(vdir)), "promote never happened"
        time.sleep(0.4)
        assert not announced(), \
            "publish registered while the commit lease was held"
    t.join(timeout=120)
    assert announced()


def test_drop_interval_registers_under_commit_lease(root):
    import threading
    import time

    from druid_hadoop_utils_spark.sources.lease import commit_lease
    from druid_hadoop_utils_spark.sources.maintenance import drop_interval

    def tombstoned():
        return any(m.tombstone for m in list_manifests(root, "t"))

    with commit_lease(root, "t", "holder"):
        t = threading.Thread(
            target=lambda: drop_interval(root, "t", "2024-01-01/2024-01-02"))
        t.start()
        time.sleep(0.4)
        assert not tombstoned(), \
            "drop_interval registered while the commit lease was held"
    t.join(timeout=60)
    assert tombstoned()


def test_write_segment_registers_under_commit_lease(spark, root):
    import threading
    import time

    from druid_hadoop_utils_spark.sources.lease import commit_lease
    from druid_hadoop_utils_spark.sources.segments import write_segment

    df = spark.createDataFrame(
        [Row(__time=datetime(2024, 1, 5, 1), k="k1", v=1.0)])

    def announced():
        return any(m.version == "vws" for m in list_manifests(root, "t"))

    with commit_lease(root, "t", "holder"):
        t = threading.Thread(target=lambda: write_segment(
            df, root, "t", "2024-01-05/2024-01-06", "vws"))
        t.start()
        time.sleep(0.6)
        assert not announced(), \
            "write_segment registered while the commit lease was held"
    t.join(timeout=120)
    assert announced()


def test_restore_to_commits_under_commit_lease(spark, root):
    import threading
    import time

    from druid_hadoop_utils_spark.sources.lease import commit_lease
    from druid_hadoop_utils_spark.sources.maintenance import (
        drop_interval,
        restore_to,
    )
    from druid_hadoop_utils_spark.sources.segments import (
        max_published_stamp,
    )

    pre_drop = max_published_stamp(root, "t")
    drop_interval(root, "t", "2024-01-01/2024-01-02")

    def day1_visible():
        return any(("2024-01-01T01:00:00", "k1") == (t_, k)
                   for t_, k, _v in _rows(spark, root))

    assert not day1_visible()
    done = []
    with commit_lease(root, "t", "holder"):
        t = threading.Thread(target=lambda: done.append(
            restore_to(root, "t", pre_drop)))
        t.start()
        time.sleep(0.5)
        assert not day1_visible(), \
            "restore announced while the commit lease was held"
    t.join(timeout=60)
    assert done and done[0], "restore did not announce anything"
    assert day1_visible()


def test_commit_lease_timeout_reclaims_staged_dirs(spark, root, monkeypatch):
    """A merge whose commit cannot acquire the lease (held past the wait
    deadline) raises AND reclaims its staged never-visible dirs — no
    standing storage bill from a timed-out commit (VERDICT r10 item 2)."""
    import functools
    import threading
    import time

    from druid_hadoop_utils_spark.sources import lease as lease_mod
    from druid_hadoop_utils_spark.sources.fs import get_fs
    from druid_hadoop_utils_spark.sources.lease import MaintenanceLockHeld

    real = lease_mod.commit_lease
    monkeypatch.setattr(
        lease_mod, "commit_lease", functools.partial(real, wait_s=0.5))

    fs = get_fs(root)
    stop = threading.Event()

    def holder():
        with real(root, "t", "hog", wait_s=30.0):
            stop.wait(timeout=30)

    h = threading.Thread(target=holder)
    h.start()
    time.sleep(0.3)  # let the hog acquire
    try:
        with pytest.raises(MaintenanceLockHeld):
            merge_into(spark, root, "t", _ups(spark, 1, 1, "k1", 999.0),
                       ["k"])
    finally:
        stop.set()
        h.join(timeout=30)
    # nothing announced, staged dirs reclaimed
    ms = list_manifests(root, "t")
    assert not any("merge" in m.version for m in ms)

    def canon(p):
        return fs.spark_url(p).rstrip("/")

    referenced = {canon(m.path) for m in ms if m.path}
    stray = []
    seg_parent = fs.join(root, "t")
    for name in fs.ls(seg_parent):
        if name.startswith("_"):
            continue
        d = fs.join(seg_parent, name)
        for sub in fs.ls(d):
            p = fs.join(d, sub).rstrip("/")
            cp = canon(p)
            if fs.isdir(p) and not any(
                    r == cp or r.startswith(cp + "/") for r in referenced):
                stray.append(p)
    assert stray == [], f"timed-out commit left staged dirs: {stray}"


# ---------------------------------------------------------------------
# two real processes: plain publish vs merge — no announcement is lost
# ---------------------------------------------------------------------


def _race_publish(root, barrier, out):
    """Child: a PLAIN publish (no fingerprint check of its own) into the
    merge's affected bucket, barrier-aligned with the merge's commit."""
    try:
        from druid_hadoop_utils_spark.session import get_spark
        from druid_hadoop_utils_spark.sources.ingest import (
            publish_segments as pub,
        )

        spark = get_spark("pub-race", master="local[2]",
                          shuffle_partitions=2)
        spark.sparkContext.setLogLevel("ERROR")
        df = spark.createDataFrame(
            [Row(ts=datetime(2024, 1, 1, 1), k="k1", v=555.0)])
        barrier.wait(timeout=120)
        pub(df, root, "t", version="v2", time_column="ts", bucket="DAY")
        out.put(("pub", "published", 555.0))
        spark.stop()
    except Exception as e:  # pragma: no cover - debugging aid
        out.put(("pub", f"ERROR:{type(e).__name__}", str(e)[:300]))


@pytest.mark.slow
def test_two_process_publish_vs_merge_race(tmp_path, spark):
    """VERDICT r10 item 1 'done' bar: a plain publish racing a DML
    commit. Every announcement serializes on the commit lease, so either
    the publish lands first (the merge sees the changed fingerprint and
    refuses — the publish is preserved) or the merge commits first (the
    publish registers after it — BOTH manifests exist). A publish
    landing inside the merge's check+register window — announced but
    silently overshadowed with the merge unaware — is impossible."""
    root = str(tmp_path / "tbl")
    rows = [Row(ts=datetime(2024, 1, 1 + d, h), k=f"k{h}",
                v=float(d * 10 + h)) for d in range(3) for h in (1, 2, 3)]
    publish_segments(spark.createDataFrame(rows), root, "t", version="v1",
                     time_column="ts", bucket="DAY")

    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(2)
    out = ctx.Queue()
    ps = [ctx.Process(target=_race_merge,
                      args=(root, "m", 999.0, 1, barrier, out)),
          ctx.Process(target=_race_publish, args=(root, barrier, out))]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=300)
    results = [out.get(timeout=30) for _ in ps]
    by_who = {w: (s, d) for w, s, d in results}
    assert by_who["pub"][0] == "published", results
    ms = list_manifests(root, "t")
    versions = {m.version for m in ms}
    # the publish's announcement is NEVER lost
    assert "v2" in versions, (results, versions)
    merge_versions = {v for v in versions if "merge" in v}
    if by_who["m"][0] == "ok":
        # merge committed before the publish registered: both exist
        assert len(merge_versions) == 1, (results, versions)
    else:
        # publish landed first: merge refused, nothing of it on disk
        assert by_who["m"][0] == "conflict", results
        assert merge_versions == set(), (results, versions)


def test_publish_detects_mid_publish_dml_overshadow(spark, tmp_path,
                                                    monkeypatch):
    """Round-12 review catch: with the commit lease held per CHUNK, a
    DML can commit between a publish's chunks and rewrite a bucket the
    publish registers only later — that bucket's publish data would be
    silently overshadowed. The publish's post-registration validation
    must turn this into a loud ConcurrentWriteConflict."""
    from contextlib import contextmanager

    from druid_hadoop_utils_spark.sources import ingest as ingest_mod
    from druid_hadoop_utils_spark.sources import lease as lease_mod
    from druid_hadoop_utils_spark.sources.dml import (
        ConcurrentWriteConflict,
        merge_into,
    )

    root = str(tmp_path / "tbl")
    rows = [Row(ts=datetime(2024, 1, 1 + d, 1), k="k1", v=float(d))
            for d in range(3)]
    publish_segments(spark.createDataFrame(rows), root, "t", version="v1",
                     time_column="ts", bucket="DAY")

    # one registration per lease hold → day 1 / day 2 / day 3 chunks
    monkeypatch.setattr(ingest_mod, "_REGISTER_CHUNK", 1)
    real = lease_mod.commit_lease
    state = {"publish_holds": 0, "merged": False}

    @contextmanager
    def interleaving(table_root, data_source, op, **kw):
        with real(table_root, data_source, op, **kw) as h:
            yield h
        if op == "publish_segments":
            state["publish_holds"] += 1
            if state["publish_holds"] == 1 and not state["merged"]:
                # between chunk 1 (day 1) and chunk 2: a merge rewrites
                # day 3, which the publish registers only in chunk 3
                state["merged"] = True
                merge_into(
                    spark, root, "t",
                    spark.createDataFrame(
                        [Row(__time=datetime(2024, 1, 3, 1), k="k1",
                             v=999.0)]),
                    ["k"])

    monkeypatch.setattr(lease_mod, "commit_lease", interleaving)
    with pytest.raises(ConcurrentWriteConflict, match="rewritten"):
        publish_segments(
            spark.createDataFrame(
                [Row(ts=datetime(2024, 1, 1 + d, 2), k="k2", v=float(d))
                 for d in range(3)]),
            root, "t", version="v2", time_column="ts", bucket="DAY")

    # the merge's rewrite IS the visible day-3 state (loss was loud,
    # nothing silently vanished from the DML side)
    ms = [m for m in list_manifests(root, "t") if not m.tombstone]
    day3_versions = {m.version for m in ms if m.interval.start.day == 3}
    assert any("merge" in v for v in day3_versions), day3_versions


# ---------------------------------------------------------------------
# the composed maintenance loop beside live DML (VERDICT r13 item 6):
# maintain_table claims lease-safety next to concurrent traffic — it
# adds sequencing, not a new lock scope — so drive the WHOLE loop
# against a merge in a second process and assert no lost announcement
# and a consistent post-state under whichever interleaving the race
# actually lands.
# ---------------------------------------------------------------------


def _race_merge_during_maintenance(root, value, barrier, out):
    """Child: own SparkSession; stage a day-1 merge, then barrier right
    before the commit so the parent can start maintain_table while this
    commit is in flight."""
    try:
        from druid_hadoop_utils_spark.session import get_spark
        from druid_hadoop_utils_spark.sources.dml import (
            ConcurrentWriteConflict as CWC,
        )
        from druid_hadoop_utils_spark.sources.dml import merge_into as mi

        spark = get_spark("maint-race-merge", master="local[2]",
                          shuffle_partitions=2)
        spark.sparkContext.setLogLevel("ERROR")
        ups = spark.createDataFrame(
            [Row(__time=datetime(2024, 1, 1, 1), k="k1", v=value)])
        try:
            mi(spark, root, "t", ups, ["k"],
               _pre_commit_hook=lambda: barrier.wait(timeout=300))
            out.put(("merge", "ok", value))
        except CWC as e:
            out.put(("merge", "conflict", str(e)[:200]))
        finally:
            spark.stop()
    except Exception as e:  # pragma: no cover - debugging aid
        out.put(("merge", f"ERROR:{type(e).__name__}", str(e)[:300]))


@pytest.mark.slow
def test_maintain_table_vs_concurrent_merge(tmp_path, spark):
    """maintain_table (advisor compaction + vacuum + derived-state
    sweeps) races a merge_into committing from a second process.
    Invariants that must hold under EVERY interleaving: the only
    per-step failures are loud optimistic-conflict refusals; the
    merge's reported outcome matches the final visible state exactly
    (announced-then-lost is impossible); every other row is untouched;
    and a follow-up maintenance cycle runs clean."""
    import glob
    import shutil

    from druid_hadoop_utils_spark.sources.maintenance import (
        compaction_candidates,
        maintain_table,
    )

    root = str(tmp_path / "tbl")
    rows = [Row(ts=datetime(2024, 1, 1 + d, h), k=f"k{h}",
                v=float(d * 10 + h)) for d in range(3) for h in (1, 2, 3)]
    publish_segments(spark.createDataFrame(rows), root, "t", version="v1",
                     time_column="ts", bucket="DAY")
    # fragment every day so auto_compact has real rewrite work to do
    for d in (1, 2, 3):
        f = glob.glob(f"{root}/t/2024-01-0{d}*/v=v1/shard=0/*.parquet")[0]
        for i in range(6):
            shutil.copy(f, f.replace("part-", f"x{i}-part-"))
    base = dict(((t, k), v) for t, k, v in _rows(spark, root))

    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(2)
    out = ctx.Queue()
    p = ctx.Process(target=_race_merge_during_maintenance,
                    args=(root, 999.0, barrier, out))
    p.start()
    barrier.wait(timeout=300)  # child is staged and about to commit
    rep = maintain_table(spark, root, "t", min_file_bytes=1024 * 1024,
                         strict=False)
    p.join(timeout=300)
    who, status, detail = out.get(timeout=30)
    assert who == "merge" and status in ("ok", "conflict"), (status,
                                                             detail)
    # maintenance step failures may ONLY be optimistic-conflict
    # refusals (the merge landing inside compaction's read-to-commit
    # window) — anything else is a real bug. The report names the
    # exception class for exactly this kind of triage.
    assert all("ConcurrentWriteConflict" in e for e in rep["errors"]), \
        rep["errors"]

    after = dict(((t, k), v) for t, k, v in _rows(spark, root))
    assert len(after) == len(base)
    key = ("2024-01-01T01:00:00", "k1")
    if status == "ok":
        assert after[key] == 999.0  # announced => visible, never lost
    else:
        assert after[key] == base[key]
    for cell, v in after.items():
        if cell != key:
            assert v == base[cell], cell

    # the loop recovers: the next cycle runs clean, clears the advisor,
    # and moves no rows
    rep2 = maintain_table(spark, root, "t", min_file_bytes=1024 * 1024,
                          strict=False)
    assert rep2["errors"] == [], rep2["errors"]
    assert compaction_candidates(root, "t",
                                 min_file_bytes=1024 * 1024) == []
    assert dict(((t, k), v) for t, k, v in _rows(spark, root)) == after
