"""Maintenance lease: mutual exclusion for destructive metadata sweeps.

``vacuum``, ``compact_manifests``, and ``restore_to`` each read the
manifest directory, then rewrite or delete parts of it. Interleaved, two
sweeps can clobber each other's snapshot rewrite — the concrete failure
(VERDICT r7): ``compact_manifests`` reads the per-segment files plus the
old snapshot, writes a NEW snapshot, then deletes its sources; a vacuum
racing it rewrites the OLD snapshot (dropping reclaimed entries) and
deletes their data dirs; compact's new snapshot was built from the
pre-vacuum listing, so it RESURRECTS the reclaimed entries as manifests
whose data dirs are gone — dangling references, the one failure mode the
per-op crash-window ordering does not cover. The lease serializes the
maintenance ops per (table_root, data_source).

Protocol — object-store-compatible, no atomic create-if-absent assumed
(the reference's HDFS deployment had rename; S3/GCS do not):

1. read the lease object; a LIVE lease (unexpired, different owner)
   refuses loudly (``MaintenanceLockHeld``) — maintenance is a singleton
   cron in practice, so "wait" is the caller's retry policy, not ours;
2. atomic-put a lease with a fresh owner token (tmp+rename on POSIX,
   plain PUT on object stores — both atomic per the fs seam contract);
3. wait a short settle window and re-read: if the surviving owner is
   someone else, two writers raced the PUT (last-writer-wins) — back off
   and refuse. The loser's own PUT was overwritten, so exactly one
   winner proceeds;
4. release verifies the owner token before deleting, so a holder whose
   lease EXPIRED and was stolen never deletes the thief's lease.

TTL expiry (default 15 min) unbricks a crashed holder; ``renew()``
extends a long sweep. On backends exposing BOTH conditional-write
primitives (``supports_put_if_absent`` + ``supports_conditional_delete``
— POSIX; ``objectcas://``; real S3 since its 2024 conditional writes)
acquisition AND expired-steal are true mutexes: create-if-absent for
fresh leases, If-Match delete of exactly the expired object + create-
if-absent for steals — two winners are impossible. The put-settle-verify
dance below remains only as the fallback for stores without conditional
writes, with its documented residual: a put-visibility delay longer than
the settle window could let two racers both believe they won (S3 has
been strongly read-after-write consistent since 2020, so the 50 ms
default covers real backends). Every op stays individually crash-safe
regardless — the lease removes the cross-op interleavings, not the
per-op orderings.
"""

from __future__ import annotations

import json
import os
import socket
import time
import uuid
from contextlib import contextmanager
from datetime import datetime, timezone

LEASE_FILE = "_lease.json"
COMMIT_LEASE_FILE = "_commit.json"
DEFAULT_TTL_S = 900.0
DEFAULT_SETTLE_S = 0.05
COMMIT_TTL_S = 60.0
COMMIT_WAIT_S = 30.0


class MaintenanceLockHeld(RuntimeError):
    """Another maintenance op holds (or just won) this table's lease."""


def _lease_path(fs, table_root: str, data_source: str,
                name: str = LEASE_FILE) -> str:
    from druid_hadoop_utils_spark.sources.segments import MANIFEST_DIR

    return fs.join(table_root, data_source, MANIFEST_DIR, name)


def _read(fs, path: str) -> dict | None:
    for attempt in (0, 1):
        try:
            return json.loads(fs.read_text(path))
        except (FileNotFoundError, OSError):
            return None
        except ValueError:
            if attempt == 0:
                time.sleep(0.02)
    # still unparsable: either a writer crashed between the O_EXCL create
    # and the content write (a µs window) or the object is corrupt. Fresh
    # → report it as HELD (never race a live writer); stale → absent.
    try:
        if time.time() - fs.mtime(path) < 5.0:
            return {"owner": "__unreadable__", "op": "unknown",
                    "expiresEpoch": time.time() + 5.0}
    except (FileNotFoundError, OSError):
        pass
    return None


def read_lease(table_root: str, data_source: str) -> dict | None:
    """The table's ACTIVE maintenance lease, or None when absent or
    expired. Cheap (one metadata GET) — ``create_tag`` uses it to detect
    a live vacuum it may have raced."""
    from druid_hadoop_utils_spark.sources.fs import get_fs

    fs = get_fs(table_root)
    cur = _read(fs, _lease_path(fs, table_root, data_source))
    if cur is None or float(cur.get("expiresEpoch", 0)) <= time.time():
        return None
    return cur


class _Lease:
    def __init__(self, fs, path: str, token: str, op: str, ttl_s: float):
        self._fs = fs
        self._path = path
        self.token = token
        self.op = op
        self._ttl_s = ttl_s

    def renew(self) -> None:
        """Extend the TTL from now (long sweeps call this between
        phases). Raises if the lease expired and was stolen meanwhile."""
        cur = _read(self._fs, self._path)
        if not cur or cur.get("owner") != self.token:
            raise MaintenanceLockHeld(
                f"maintenance lease for {self._path} was lost (expired "
                f"and taken by {cur.get('op') if cur else 'nobody'}) — "
                "the sweep outlived its TTL; rerun it"
            )
        self._fs.put_text(self._path, json.dumps(
            _lease_obj(self.token, self.op, self._ttl_s), indent=2))


def _lease_obj(token: str, op: str, ttl_s: float) -> dict:
    now = time.time()
    return {
        "owner": token,
        "op": op,
        "pid": os.getpid(),
        "host": socket.gethostname(),
        "acquiredAt": datetime.now(timezone.utc).isoformat(),
        "expiresEpoch": now + ttl_s,
    }


def _try_acquire(fs, path: str, data_source: str, op: str,
                 ttl_s: float, settle_s: float) -> "_Lease":
    """One acquisition attempt on the lease file at ``path``; raises
    ``MaintenanceLockHeld`` when held or lost. Shared by the maintenance
    lease and the (short-TTL, separate-file) DML commit lease."""
    fs.mkdirs(fs.parent(path))
    now = time.time()
    cur = _read(fs, path)
    if cur and float(cur.get("expiresEpoch", 0)) > now:
        raise MaintenanceLockHeld(
            f"{data_source}: maintenance lease held by op="
            f"{cur.get('op')!r} (pid {cur.get('pid')} on "
            f"{cur.get('host')}, expires in "
            f"{float(cur['expiresEpoch']) - now:.0f}s) — refusing to "
            f"run {op!r} concurrently; retry after it finishes or "
            "expires"
        )
    token = uuid.uuid4().hex
    body = json.dumps(_lease_obj(token, op, ttl_s), indent=2)
    stealing = cur is not None  # expired leftover blocks create-if-absent
    if fs.supports_put_if_absent and not stealing:
        # POSIX O_EXCL: the kernel arbitrates, exactly one creator wins —
        # a true mutex, no settle window needed
        if not fs.put_text_if_absent(path, body):
            cur = _read(fs, path)
            raise MaintenanceLockHeld(
                f"{data_source}: lost the lease race to op="
                f"{cur.get('op') if cur else '?'} while acquiring for "
                f"{op!r}; retry after it finishes"
            )
    elif (stealing and fs.supports_put_if_absent
          and fs.supports_conditional_delete):
        # conditional-write steal (S3 `If-Match` DELETE + `If-None-Match`
        # PUT, public behavior since 2024; POSIX sidecar-locked CAD):
        # delete EXACTLY the expired lease object we read, then
        # create-if-absent. A concurrent stealer loses either the
        # conditional delete (the object is already gone or replaced) or
        # the create — two winners are impossible, and nothing here ever
        # deletes unconditionally, so a loser can never yank the
        # winner's fresh lease. This branch closes the put-visibility
        # residual the settle protocol below documents.
        try:
            raw = fs.read_text(path)
        except (FileNotFoundError, OSError):
            raw = None  # another stealer's delete landed first
        if raw is not None:
            try:
                live = float(json.loads(raw).get(
                    "expiresEpoch", 0)) > time.time()
            except ValueError:
                # unparsable body: either a writer mid-PUT on a backend
                # whose conditional create is not content-atomic, or a
                # genuinely corrupt leftover. Apply _read's freshness
                # rule HERE too — a FRESH unreadable lease is treated as
                # held (never compare-and-delete a possibly-live
                # writer's newborn lease); only a stale one is stealable
                try:
                    fresh = time.time() - fs.mtime(path) < 5.0
                except (FileNotFoundError, OSError):
                    fresh = False
                if fresh:
                    raise MaintenanceLockHeld(
                        f"{data_source}: lease object is fresh but "
                        f"unreadable while stealing for {op!r} — "
                        "treating as held; retry shortly"
                    )
                live = False
            if live:
                raise MaintenanceLockHeld(
                    f"{data_source}: lease was re-acquired while stealing "
                    f"for {op!r}; retry after it finishes or expires"
                )
            if not fs.delete_file_if_unchanged(path, raw):
                raise MaintenanceLockHeld(
                    f"{data_source}: lost the expired-lease steal race "
                    f"while acquiring for {op!r}; retry after the winner "
                    "finishes"
                )
        if not fs.put_text_if_absent(path, body):
            cur = _read(fs, path)
            raise MaintenanceLockHeld(
                f"{data_source}: lost the lease race to op="
                f"{cur.get('op') if cur else '?'} while acquiring for "
                f"{op!r}; retry after it finishes"
            )
    else:
        # Fallback for backends WITHOUT the conditional-write pair
        # (plain objectsim; object stores predating S3's 2024
        # conditional writes): put, wait a settle window, re-read — the
        # surviving owner is the winner. Concurrent stealers of one
        # expired lease thus resolve to exactly one winner as long as
        # their delete→put→verify spans overlap within settle_s; the
        # residual (a put-visibility delay longer than settle_s) is the
        # known limit of lease files without compare-and-swap — the
        # conditional branch above is exactly what removes it.
        if stealing:
            fs.delete_file(path)
        fs.put_text(path, body)
        time.sleep(max(settle_s, 0.2) if stealing else settle_s)
        cur = _read(fs, path)
        if not cur or cur.get("owner") != token:
            raise MaintenanceLockHeld(
                f"{data_source}: lost the lease race to op="
                f"{cur.get('op') if cur else '?'} while acquiring for "
                f"{op!r}; retry after it finishes"
            )
    return _Lease(fs, path, token, op, ttl_s)


def _release(fs, path: str, token: str) -> None:
    cur = _read(fs, path)
    if cur and cur.get("owner") == token:
        try:
            fs.delete_file(path)
        except (FileNotFoundError, OSError):
            pass


@contextmanager
def maintenance_lease(
    table_root: str,
    data_source: str,
    op: str,
    ttl_s: float = DEFAULT_TTL_S,
    settle_s: float = DEFAULT_SETTLE_S,
):
    """Hold the table's maintenance lease for the duration of ``op``.

    Refuses loudly (``MaintenanceLockHeld``) when another op holds it —
    callers retry on their own schedule (maintenance is cron-shaped).
    Yields a handle with ``renew()`` for sweeps that may outlive the TTL.
    """
    from druid_hadoop_utils_spark.sources.fs import get_fs

    fs = get_fs(table_root)
    path = _lease_path(fs, table_root, data_source)
    handle = _try_acquire(fs, path, data_source, op, ttl_s, settle_s)
    try:
        yield handle
    finally:
        _release(fs, path, handle.token)


@contextmanager
def commit_lease(
    table_root: str,
    data_source: str,
    op: str,
    ttl_s: float = COMMIT_TTL_S,
    settle_s: float = DEFAULT_SETTLE_S,
    wait_s: float = COMMIT_WAIT_S,
):
    """Serialize the DML commit critical section (re-validate the affected
    buckets' timeline, then register) per (table_root, data_source).

    Unlike the maintenance lease this WAITS: commits are metadata-only and
    sub-second, so a contending writer polls until ``wait_s`` elapses
    before refusing. It also lives in its OWN file (``_commit.json``):
    DML commits must not block behind a 15-minute maintenance sweep —
    a concurrent compaction is detected by the caller's timeline
    re-validation, not by this lock. Same backend semantics as the
    maintenance lease (POSIX and conditional-write object stores = true
    mutex incl. expired-steal; stores without conditional writes =
    put-settle-verify with the documented put-visibility residual).
    """
    from druid_hadoop_utils_spark.sources.fs import get_fs

    fs = get_fs(table_root)
    path = _lease_path(fs, table_root, data_source, COMMIT_LEASE_FILE)
    deadline = time.time() + wait_s
    while True:
        try:
            handle = _try_acquire(fs, path, data_source, op, ttl_s, settle_s)
            break
        except MaintenanceLockHeld:
            if time.time() >= deadline:
                raise
            time.sleep(0.05)
    try:
        yield handle
    finally:
        _release(fs, path, handle.token)
