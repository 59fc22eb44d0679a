"""Round-12 regression pins for the ADVICE r11 findings.

1. (high) Reclamation age gates must never trust a virtual-directory
   mtime: on real object stores pyarrow reports no mtime for prefixes
   (ArrowMetaFS surfaces 0.0), so an age gate reading the dir mtime saw
   every IN-FLIGHT writer's staged tree as infinitely old and vacuumed
   data whose commit then registered manifests pointing at deleted dirs
   — silent data loss, masked by the local test backends whose
   directories carry real mtimes. `prefix_age_s` (fs.py) now falls back
   to the newest FILE mtime and returns None (= not old enough) when no
   trustworthy age exists; vacuum's staged-orphan sweep,
   vacuum_materialized and the result-cache sweep all route through it.

2. (medium) `put_text_if_absent` on the local-disk backends used
   O_EXCL-create-then-write, leaving a window where the lease file
   exists EMPTY; a concurrent expired-lease stealer could read the
   winner's newborn lease as torn, classify it dead, compare-and-delete
   it and acquire — two holders on the path that promises a true mutex.
   Now the body is written to a private temp file first and
   `os.link`ed into place: the name carries full content the instant it
   exists. Belt-and-suspenders: the steal path treats a FRESH
   unparsable lease as HELD instead of stealable.

3. (low) `_local_delete_if_unchanged`'s stale-sidecar-lock deadline is
   reset after breaking ONE stale lock (previously every later
   FileExistsError also removed a LIVE racer's lock), and the final
   remove tolerates the file vanishing (returns False instead of
   raising).

4. (low) `publish_segments` takes the commit lease per bounded CHUNK of
   manifest registrations instead of across the whole publish, so a
   many-bucket publish cannot starve concurrent DML commits past their
   30 s wait; each individual registration is still serialized with any
   DML's check+register window.
"""

from __future__ import annotations

import os
import time

import pytest

from druid_hadoop_utils_spark.sources.fs import (
    LocalMetaFS,
    ObjectStoreCasFS,
    ObjectStoreSimFS,
    _local_delete_if_unchanged,
    get_fs,
    prefix_age_s,
)
from druid_hadoop_utils_spark.sources.lease import (
    MaintenanceLockHeld,
    _try_acquire,
)


# ---------------------------------------------------------------------
# 1. prefix_age_s: the virtual-directory-safe age primitive
# ---------------------------------------------------------------------


class _VirtualDirFS(ObjectStoreSimFS):
    """ObjectStoreSimFS that reports mtime 0.0 for DIRECTORIES — exactly
    what ArrowMetaFS surfaces for object-store prefixes (pyarrow
    FileInfo.mtime is None for virtual dirs)."""

    def mtime(self, path: str) -> float:
        local = self._local(path)
        if os.path.isdir(local):
            return 0.0
        return os.path.getmtime(local)


def test_prefix_age_from_real_dir_mtime(tmp_path):
    d = tmp_path / "seg"
    d.mkdir()
    (d / "part-0.parquet").write_text("x")
    age = prefix_age_s(LocalMetaFS(), str(d))
    assert age is not None and 0 <= age < 60


def test_prefix_age_virtual_dir_falls_back_to_newest_file(tmp_path):
    d = tmp_path / "seg"
    d.mkdir()
    old = d / "old.parquet"
    new = d / "new.parquet"
    old.write_text("x")
    new.write_text("y")
    past = time.time() - 7200
    os.utime(old, (past, past))

    fs = _VirtualDirFS()
    path = "objectsim://" + str(d)
    age = prefix_age_s(fs, path)
    # the NEWEST file governs: an in-flight writer still adding files
    # keeps the prefix young even if earlier files are hours old
    assert age is not None and age < 60

    os.utime(new, (past, past))
    age2 = prefix_age_s(fs, path)
    assert age2 is not None and age2 >= 7000


def test_prefix_age_none_when_no_trustworthy_age(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    fs = _VirtualDirFS()
    # virtual dir + no files under it = no age at all → None, and every
    # gate treats None as NOT old enough (refusing to reclaim is safe)
    assert prefix_age_s(fs, "objectsim://" + str(d)) is None
    # missing path → None too
    assert prefix_age_s(fs, "objectsim://" + str(d / "nope")) is None


def test_vacuum_never_yanks_fresh_staged_dirs_on_virtual_dir_store(
    spark, tmp_path, monkeypatch
):
    """End-to-end pin of the data-loss scenario: a store whose directory
    prefixes carry no mtime (real S3/GCS through pyarrow) must NOT see a
    fresh staged-but-uncommitted publish as infinitely old."""
    from datetime import datetime

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.sources.ingest import publish_segments
    from druid_hadoop_utils_spark.sources.maintenance import vacuum

    # make the objectsim backend report virtual-dir mtimes, like pyarrow
    monkeypatch.setattr(ObjectStoreSimFS, "mtime", _VirtualDirFS.mtime)

    root = "objectsim://" + str(tmp_path / "tbl")
    publish_segments(
        spark.createDataFrame([Row(ts=datetime(2024, 1, 1, 1), k="a",
                                   v=1.0)]),
        root, "t", version="v1", time_column="ts", bucket="DAY")
    staged = publish_segments(
        spark.createDataFrame([Row(ts=datetime(2024, 1, 1, 2), k="b",
                                   v=2.0)]),
        root, "t", version="merge-inflight-v2", time_column="ts",
        bucket="DAY", register=False)
    fs = get_fs(root)
    vdirs = {fs.parent(m.path) for m in staged}
    assert all(fs.isdir(d) for d in vdirs)

    # the default 24 h gate: the fresh staged dir MUST survive even
    # though its dir mtime reads 0.0 (pre-fix: reclaimed = data loss)
    removed = vacuum(root, "t")
    assert all(fs.isdir(d) for d in vdirs), \
        "virtual-dir mtime 0.0 was trusted: in-flight staged data yanked"
    assert not any("merge-inflight-v2" in r for r in removed)

    # age 0 still reclaims — through the file-mtime fallback
    removed = vacuum(root, "t", reclaim_staged_after_s=0.0)
    assert not any(fs.isdir(d) for d in vdirs)
    assert any("merge-inflight-v2" in r for r in removed)


# ---------------------------------------------------------------------
# 2. content-atomic put_text_if_absent + fresh-unreadable steal refusal
# ---------------------------------------------------------------------


@pytest.mark.parametrize("mk", [
    lambda p: (LocalMetaFS(), str(p)),
    lambda p: (ObjectStoreCasFS(), "objectcas://" + str(p)),
])
def test_put_if_absent_is_content_atomic(tmp_path, mk):
    fs, base = mk(tmp_path)
    path = fs.join(base, "lease.json")
    assert fs.put_text_if_absent(path, "BODY") is True
    assert fs.read_text(path) == "BODY"
    # loser leaves the winner's content untouched
    assert fs.put_text_if_absent(path, "OTHER") is False
    assert fs.read_text(path) == "BODY"
    # no temp-file litter from either call
    litter = [n for n in os.listdir(tmp_path) if "__ifabsent" in n]
    assert litter == []


def test_put_if_absent_never_visible_empty(tmp_path):
    """The created name must carry its full body the instant it exists:
    hammer create/observe/delete cycles and assert no observer read ever
    sees a partial object (the pre-fix O_EXCL+write protocol exposed an
    empty file)."""
    import threading

    fs = LocalMetaFS()
    path = str(tmp_path / "obj.json")
    body = "x" * 4096
    stop = threading.Event()
    torn: list[str] = []

    def observer():
        while not stop.is_set():
            try:
                with open(path) as f:
                    cur = f.read()
            except FileNotFoundError:
                continue
            if cur != body:
                torn.append(cur)
                return

    t = threading.Thread(target=observer)
    t.start()
    try:
        for _ in range(300):
            assert fs.put_text_if_absent(path, body)
            os.remove(path)
    finally:
        stop.set()
        t.join()
    assert torn == [], f"observer saw a partial object ({len(torn[0])} B)"


def test_steal_refuses_fresh_unreadable_lease(tmp_path):
    """Expired lease seen by _read, but by the time the steal path
    re-reads, the body is unparsable and FRESH (a writer mid-PUT on a
    backend without content-atomic conditional create): the stealer
    must refuse as held, never compare-and-delete."""
    inner = ObjectStoreCasFS()
    base = "objectcas://" + str(tmp_path)
    path = inner.join(base, "_segments", "_commit.json")
    expired = ('{"owner": "w1", "op": "old", "pid": 1, '
               '"expiresEpoch": 1.0}')
    inner.mkdirs(inner.parent(path))
    inner.put_text(path, expired)

    class _TornSecondRead:
        """Delegate everything; read_text returns the expired lease once
        (for _read) then torn garbage (the steal path's re-read)."""

        def __init__(self):
            self.reads = 0
            self.cad_called = False

        def __getattr__(self, name):
            return getattr(inner, name)

        def read_text(self, p):
            self.reads += 1
            if self.reads == 1:
                return expired
            return ""  # torn: writer created the object, body not landed

        def delete_file_if_unchanged(self, p, expected):
            self.cad_called = True
            return inner.delete_file_if_unchanged(p, expected)

    fs = _TornSecondRead()
    with pytest.raises(MaintenanceLockHeld, match="unreadable"):
        _try_acquire(fs, path, "ds", "steal-attempt", ttl_s=5.0,
                     settle_s=0.0)
    assert not fs.cad_called, \
        "stealer compare-and-deleted a fresh unreadable (mid-PUT) lease"


# ---------------------------------------------------------------------
# 3. _local_delete_if_unchanged: stale-lock break + vanished-file guard
# ---------------------------------------------------------------------


def test_delete_if_unchanged_breaks_stale_lock_and_succeeds(tmp_path):
    target = tmp_path / "obj"
    target.write_text("BODY")
    # a crashed locker's leftover sidecar
    (tmp_path / "obj.__caslock").write_text("")
    t0 = time.time()
    assert _local_delete_if_unchanged(str(target), "BODY") is True
    assert not target.exists()
    # it waited out the 5 s staleness deadline before breaking the lock
    assert time.time() - t0 >= 4.5
    assert not (tmp_path / "obj.__caslock").exists()


def test_delete_if_unchanged_tolerates_vanished_file(tmp_path):
    target = tmp_path / "obj"
    # never existed → False, no raise
    assert _local_delete_if_unchanged(str(target), "BODY") is False
    target.write_text("OTHER")
    assert _local_delete_if_unchanged(str(target), "BODY") is False
    assert target.read_text() == "OTHER"


# ---------------------------------------------------------------------
# 4. publish_segments: chunked commit-lease hold
# ---------------------------------------------------------------------


def test_many_bucket_publish_registers_all_and_releases_lease(
    spark, tmp_path
):
    """>1 chunk of buckets (chunk = 50): every bucket's manifest lands,
    and the commit lease is RELEASED afterwards (chunked acquire/release
    rather than one publish-long hold)."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.sources.ingest import publish_segments
    from druid_hadoop_utils_spark.sources.lease import (
        COMMIT_LEASE_FILE,
        _lease_path,
        _read,
    )
    from druid_hadoop_utils_spark.sources.segments import list_manifests

    root = str(tmp_path / "tbl")
    base = datetime(2024, 1, 1)
    rows = [Row(ts=base + timedelta(days=d), k=f"k{d}", v=float(d))
            for d in range(60)]
    out = publish_segments(spark.createDataFrame(rows), root, "t",
                           version="v1", time_column="ts", bucket="DAY")
    assert len(out) == 60
    live = list_manifests(root, "t")
    assert len(live) == 60
    assert {str(m.interval.start.date()) for m in live} == {
        str((base + timedelta(days=d)).date()) for d in range(60)}
    fs = get_fs(root)
    assert _read(fs, _lease_path(fs, root, "t", COMMIT_LEASE_FILE)) is None
