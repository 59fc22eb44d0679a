"""Maintenance concurrency contract (VERDICT r7 item 2 + ADVICE r8).

The destructive metadata sweeps — vacuum, compact_manifests, restore_to —
serialize per (table_root, data_source) through the lease in
sources/lease.py. These tests pin: the lease semantics themselves
(mutual exclusion, expiry/steal, renew, release-verifies-owner), the
wiring (each op refuses while another holds the lease, on BOTH the POSIX
and the no-rename object-store backends), the create_tag race guards
(in-flight-vacuum refusal + post-put horizon re-check), and a REAL
multi-process race of vacuum against compact_manifests that must never
produce a dangling manifest reference.

No SparkSession needed: every op under test is metadata-only, so the
racing halves run in genuinely separate processes.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import pytest

from druid_hadoop_utils_spark.intervals import Interval
from druid_hadoop_utils_spark.sources.lease import (
    LEASE_FILE,
    MaintenanceLockHeld,
    maintenance_lease,
    read_lease,
)
from druid_hadoop_utils_spark.sources.maintenance import restore_to, vacuum
from druid_hadoop_utils_spark.sources.segments import (
    SegmentManifest,
    compact_manifests,
    create_tag,
    list_manifests,
    register_manifest,
)


@pytest.fixture(params=["local", "objectsim", "objectcas"])
def root(tmp_path, request):
    """The table root on all three lease arbitration paths: POSIX
    (O_EXCL create-if-absent + sidecar-locked compare-and-delete), the
    plain object-store sim (put-settle-verify fallback), and the
    conditional-write object-store sim (If-None-Match PUT + If-Match
    DELETE — the true-mutex branch)."""
    if request.param == "local":
        return str(tmp_path / "tbl")
    return request.param + "://" + str(tmp_path / "tbl")


def _seg(root: str, iv: str, version: str, with_data: bool = True,
         published_at: str | None = None) -> SegmentManifest:
    """Register one manifest; data dir is a plain local dir (vacuum's
    delete_dir doesn't care that it isn't parquet)."""
    from druid_hadoop_utils_spark.sources.fs import get_fs

    fs = get_fs(root)
    path = ""
    if with_data:
        path = fs.join(root, "ds", f"data_{version}_{iv.split('/')[0][:10]}")
        fs.mkdirs(path)
        fs.put_text(fs.join(path, "part-0.parquet"), "x")
    m = SegmentManifest("ds", Interval.parse(iv), version, 0, path,
                        published_at=published_at)
    register_manifest(root, m)
    return m


# ---------------------------------------------------------------------
# lease semantics
# ---------------------------------------------------------------------


def test_lease_acquire_release(root):
    assert read_lease(root, "ds") is None
    with maintenance_lease(root, "ds", "vacuum") as h:
        live = read_lease(root, "ds")
        assert live is not None and live["op"] == "vacuum"
        h.renew()  # extends without error while held
    assert read_lease(root, "ds") is None  # released


def test_lease_mutual_exclusion(root):
    with maintenance_lease(root, "ds", "vacuum"):
        with pytest.raises(MaintenanceLockHeld, match="vacuum"):
            with maintenance_lease(root, "ds", "compact_manifests"):
                pass
    # released after the context: a new acquire succeeds
    with maintenance_lease(root, "ds", "compact_manifests"):
        pass


def test_lease_expired_is_stolen(root):
    with maintenance_lease(root, "ds", "vacuum", ttl_s=0.01):
        time.sleep(0.05)
        # the first lease expired: a second acquirer may steal it
        with maintenance_lease(root, "ds", "restore_to") as h2:
            assert read_lease(root, "ds")["op"] == "restore_to"
            h2.renew()
    # the EXPIRED holder's release must not delete the thief's lease —
    # exercised implicitly above (inner exited cleanly, outer's finally
    # saw a foreign owner); the file is gone only because the inner
    # (rightful) holder released it
    assert read_lease(root, "ds") is None


def test_renew_after_steal_raises(root):
    with pytest.raises(MaintenanceLockHeld, match="outlived its TTL"):
        with maintenance_lease(root, "ds", "vacuum", ttl_s=0.01) as h:
            time.sleep(0.05)
            with maintenance_lease(root, "ds", "compact_manifests"):
                h.renew()  # lease was stolen: renew must refuse


# ---------------------------------------------------------------------
# wiring: the three ops hold / respect the lease
# ---------------------------------------------------------------------


def test_vacuum_refuses_while_lease_held(root):
    _seg(root, "2024-01-01/2024-01-02", "v1")
    _seg(root, "2024-01-01/2024-01-02", "v2")
    with maintenance_lease(root, "ds", "compact_manifests"):
        with pytest.raises(MaintenanceLockHeld):
            vacuum(root, "ds")
    # dry_run is read-only: allowed under a held lease
    with maintenance_lease(root, "ds", "compact_manifests"):
        assert len(vacuum(root, "ds", dry_run=True)) == 1
    assert len(vacuum(root, "ds")) == 1  # and works once released


def test_compact_and_restore_refuse_while_lease_held(root):
    _seg(root, "2024-01-01/2024-01-02", "v1")
    with maintenance_lease(root, "ds", "vacuum"):
        with pytest.raises(MaintenanceLockHeld):
            compact_manifests(root, "ds")
        with pytest.raises(MaintenanceLockHeld):
            restore_to(root, "ds", "2100-01-01")
    assert compact_manifests(root, "ds") is not None


def test_create_tag_refuses_during_live_vacuum(root):
    _seg(root, "2024-01-01/2024-01-02", "v1")
    with maintenance_lease(root, "ds", "vacuum"):
        with pytest.raises(ValueError, match="while a vacuum is running"):
            create_tag(root, "ds", "pin")
    # the refused tag must not linger
    from druid_hadoop_utils_spark.sources.segments import list_tags

    assert list_tags(root, "ds") == []
    create_tag(root, "ds", "pin")  # fine once the sweep is done


def test_create_tag_detects_horizon_moved_past_pin(root, monkeypatch):
    """TOCTOU guard (ADVICE r8): the horizon is re-read AFTER the tag is
    durable; if a racing vacuum advanced it past the pinned instant, the
    tag is deleted and the call fails loudly."""
    import druid_hadoop_utils_spark.sources.segments as seg_mod

    _seg(root, "2024-01-01/2024-01-02", "v1")
    real = seg_mod.history_horizon
    calls = {"n": 0}

    def racing(table_root, data_source):
        calls["n"] += 1
        if calls["n"] == 1:
            return real(table_root, data_source)  # pre-check: no horizon
        # post-put re-read: a vacuum finished meanwhile and advanced the
        # horizon to the far future
        from datetime import datetime, timezone

        return datetime(2099, 1, 1, tzinfo=timezone.utc)

    monkeypatch.setattr(seg_mod, "history_horizon", racing)
    with pytest.raises(ValueError, match="lost a race with a concurrent"):
        create_tag(root, "ds", "pin")
    monkeypatch.undo()
    from druid_hadoop_utils_spark.sources.segments import list_tags

    assert list_tags(root, "ds") == []  # the dangling tag was removed


# ---------------------------------------------------------------------
# the real race: vacuum ∥ compact_manifests, separate processes
# ---------------------------------------------------------------------


def _race_op(op: str, root: str, barrier, out):
    """Run one maintenance op after a cross-process barrier."""
    try:
        barrier.wait(timeout=30)
        if op == "vacuum":
            res = vacuum(root, "ds")
        else:
            res = compact_manifests(root, "ds")
        out.put((op, "ok", repr(res)[:80]))
    except MaintenanceLockHeld as e:
        out.put((op, "refused", str(e)[:80]))
    except Exception as e:  # pragma: no cover - debugging aid
        out.put((op, f"ERROR:{type(e).__name__}", str(e)[:200]))


def test_vacuum_races_compact_manifests_no_dangling_refs(tmp_path):
    """The VERDICT r7 'done' bar: race vacuum against compact_manifests
    from two real processes, many rounds. Outcome per round must be
    serialize-or-refuse — and the table must NEVER end with a manifest
    whose data dir is gone (the resurrection failure the lease exists to
    prevent)."""
    root = str(tmp_path / "tbl")
    # 6 intervals × (v1 overshadowed by v2) → vacuum has real work, and
    # enough per-segment manifest files that compact has real work too
    for d in range(1, 7):
        _seg(root, f"2024-01-0{d}/2024-01-0{d + 1}", "v1")
        _seg(root, f"2024-01-0{d}/2024-01-0{d + 1}", "v2")

    ctx = mp.get_context("spawn")
    for _round in range(3):
        barrier = ctx.Barrier(2)
        out = ctx.Queue()
        ps = [ctx.Process(target=_race_op, args=(op, root, barrier, out))
              for op in ("vacuum", "compact_manifests")]
        for p in ps:
            p.start()
        for p in ps:
            p.join(timeout=120)
        results = [out.get(timeout=10) for _ in ps]
        outcomes = {op: status for op, status, _detail in results}
        # nothing may crash; each op either ran or was loudly refused
        assert all(s in ("ok", "refused") for s in outcomes.values()), results
        # INVARIANT: every surviving non-tombstone manifest's data dir
        # still exists — no resurrection, no dangling references
        for m in list_manifests(root, "ds"):
            if not m.tombstone and m.path:
                assert os.path.isdir(m.path), (
                    f"dangling manifest {m.identifier} -> {m.path} "
                    f"after round {_round}: {results}"
                )
    # end state: the v2 view is intact
    vis = [m for m in list_manifests(root, "ds") if not m.tombstone]
    assert {m.version for m in vis} >= {"v2"}
    assert len([m for m in vis if m.version == "v2"]) == 6


def test_lease_file_is_invisible_to_listings(root):
    _seg(root, "2024-01-01/2024-01-02", "v1")
    with maintenance_lease(root, "ds", "vacuum"):
        # the lease object must not surface as a manifest
        assert len(list_manifests(root, "ds")) == 1
    from druid_hadoop_utils_spark.sources.fs import get_fs

    fs = get_fs(root)
    assert LEASE_FILE.startswith("_")  # the "_"-prefix metadata contract
    assert not fs.exists(fs.join(root, "ds", "_segments", LEASE_FILE))


def test_lease_unreadable_fresh_file_counts_as_held(root):
    """A torn lease object (writer crashed between O_EXCL create and the
    content write) must read as HELD while fresh, not as absent."""
    from druid_hadoop_utils_spark.sources.fs import get_fs

    fs = get_fs(root)
    path = fs.join(root, "ds", "_segments", LEASE_FILE)
    fs.mkdirs(fs.parent(path))
    fs.put_text(path, "{not json")
    live = read_lease(root, "ds")
    assert live is not None and live["owner"] == "__unreadable__"
    with pytest.raises(MaintenanceLockHeld):
        with maintenance_lease(root, "ds", "vacuum"):
            pass


def test_multiwriter_publish_stamp_clamps_to_existing_max(root):
    """ADVICE r8: a second writer whose clock lags must still stamp
    ABOVE the table's newest publishedAt, so as_of views order by actual
    announce order."""
    from druid_hadoop_utils_spark.sources.segments import (
        max_published_stamp,
        _parse_as_of,
    )

    future = "2099-01-01T00:00:00+00:00"  # writer A with a fast clock
    _seg(root, "2024-01-01/2024-01-02", "v1", published_at=future)
    # writer B (this process, "slow clock"): defaulted stamp must clamp
    m = _seg(root, "2024-01-02/2024-01-03", "v1")
    got = [x for x in list_manifests(root, "ds")
           if x.interval.start.day == 2][0]
    assert _parse_as_of(got.published_at) > _parse_as_of(future)
    assert max_published_stamp(root, "ds") == got.published_at
    # the clamp is PER-TABLE state: an unrelated table's next stamp must
    # stay at wall-clock, not inherit this table's future floor through
    # the process-global monotonic guard (r8 regression: a future-dated
    # fixture poisoned every later table's retention math)
    from datetime import datetime, timedelta, timezone

    from druid_hadoop_utils_spark.sources.segments import publish_stamp

    other = _parse_as_of(publish_stamp())
    assert other < datetime.now(timezone.utc) + timedelta(minutes=1)


# ---------------------------------------------------------------------
# conditional-write backends (VERDICT r10 stretch item): objectcas://
# simulates S3's public conditional writes (If-None-Match PUT since
# 2024, ETag If-Match DELETE since late 2024) — both lease acquisition
# AND expired-steal become true mutexes, closing the put-visibility
# residual of the settle protocol
# ---------------------------------------------------------------------


def _cas_fs(tmp_path):
    from druid_hadoop_utils_spark.sources.fs import get_fs

    root = "objectcas://" + str(tmp_path / "cas")
    return root, get_fs(root)


def test_objectcas_put_if_absent_exactly_one_winner(tmp_path):
    import threading

    root, fs = _cas_fs(tmp_path)
    assert fs.supports_put_if_absent and fs.supports_conditional_delete
    path = fs.join(root, "obj.json")
    fs.mkdirs(fs.parent(path))
    wins = []
    barrier = threading.Barrier(8)

    def go(i):
        barrier.wait()
        if fs.put_text_if_absent(path, f"writer-{i}"):
            wins.append(i)

    ts = [threading.Thread(target=go, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1
    assert fs.read_text(path) == f"writer-{wins[0]}"


def test_objectcas_conditional_delete_semantics(tmp_path):
    root, fs = _cas_fs(tmp_path)
    path = fs.join(root, "obj.json")
    fs.put_text(path, "v1")
    # mismatch: refused, object intact
    assert fs.delete_file_if_unchanged(path, "v0") is False
    assert fs.read_text(path) == "v1"
    # match: deleted
    assert fs.delete_file_if_unchanged(path, "v1") is True
    assert not fs.exists(path)
    # missing: refused
    assert fs.delete_file_if_unchanged(path, "v1") is False


def test_cas_steal_loser_cannot_yank_winners_lease(tmp_path):
    """The failure the settle protocol cannot rule out: a slow stealer
    unconditionally deleting the WINNER's fresh lease. With If-Match
    delete the loser's delete is refused and the winner's lease
    survives."""
    import json as _json

    from druid_hadoop_utils_spark.sources.lease import (
        _lease_obj,
        _lease_path,
        maintenance_lease,
    )

    root, fs = _cas_fs(tmp_path)
    path = _lease_path(fs, root, "ds")
    fs.mkdirs(fs.parent(path))
    expired_raw = _json.dumps(_lease_obj("dead-owner", "vacuum", -10.0),
                              indent=2)
    fs.put_text(path, expired_raw)

    with maintenance_lease(root, "ds", "restore_to"):
        # a slow concurrent stealer still holding the OLD expired bytes:
        # its conditional delete must be refused
        assert fs.delete_file_if_unchanged(path, expired_raw) is False
        live = read_lease(root, "ds")
        assert live is not None and live["op"] == "restore_to"


def test_cas_steal_race_exactly_one_winner(tmp_path):
    import json as _json
    import threading

    from druid_hadoop_utils_spark.sources.lease import (
        _lease_obj,
        _lease_path,
        maintenance_lease,
    )

    root, fs = _cas_fs(tmp_path)
    path = _lease_path(fs, root, "ds")
    fs.mkdirs(fs.parent(path))
    fs.put_text(path, _json.dumps(
        _lease_obj("dead-owner", "vacuum", -10.0), indent=2))

    barrier = threading.Barrier(6)
    outcomes = []
    lock = threading.Lock()

    def go(i):
        barrier.wait()
        try:
            with maintenance_lease(root, "ds", f"steal-{i}",
                                   settle_s=0.0) as h:
                with lock:
                    outcomes.append(("won", i))
                time.sleep(0.2)  # hold long enough that losers see US
                h.renew()
        except MaintenanceLockHeld:
            with lock:
                outcomes.append(("held", i))

    ts = [threading.Thread(target=go, args=(i,)) for i in range(6)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sum(1 for s, _i in outcomes if s == "won") == 1, outcomes
    assert read_lease(root, "ds") is None  # winner released cleanly
