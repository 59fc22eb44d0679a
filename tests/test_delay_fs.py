"""DelayFS — the latency-injecting MetaFS decorator (VERDICT r7 item 1).

Pins: the decorator counts round-trips correctly (so probes can assert
REQUEST counts, not just wall time), the ``delaysim://`` scheme resolves
to an object-store-semantics + injected-RTT filesystem, the bulk-delete
pool genuinely overlaps injected RTTs, and the headline planning claim —
``compact_manifests`` turns an N-GET listing into ONE GET — holds as a
counted fact, not an argument.
"""

from __future__ import annotations

import time

import pytest

from druid_hadoop_utils_spark.intervals import Interval
from druid_hadoop_utils_spark.sources.fs import (
    DelayFS,
    LocalMetaFS,
    get_fs,
)
from druid_hadoop_utils_spark.sources.segments import (
    SegmentManifest,
    compact_manifests,
    list_manifests,
    register_manifest,
)


@pytest.fixture
def delayroot(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DELAY_MS", "1")
    # the scheme cache may hold a DelaySimFS built under a different
    # env; force a fresh one
    from druid_hadoop_utils_spark.sources import fs as fsmod

    fsmod._CACHE.pop("delaysim", None)
    return "delaysim://" + str(tmp_path / "tbl")


def test_delaysim_scheme_resolves(delayroot):
    fs = get_fs(delayroot)
    assert isinstance(fs, DelayFS)
    assert fs.atomic_dir_rename is False  # object-store semantics
    assert fs.delay_s == pytest.approx(0.001)


def test_op_counts_and_roundtrip_charging(delayroot):
    fs = get_fs(delayroot)
    fs.reset_counts()
    p = fs.join(delayroot, "x.json")
    fs.mkdirs(fs.parent(p))  # free: object stores have no directories
    fs.put_text(p, "{}")
    assert fs.read_text(p) == "{}"
    fs.exists(p)
    fs.delete_file(p)
    assert fs.op_counts == {
        "put_text": 1, "read_text": 1, "exists": 1, "delete_file": 1}


def test_bulk_delete_overlaps_injected_rtt(tmp_path):
    """The RTT-overlap claim, measured: 64 deletes at 10 ms injected
    latency take ~640 ms sequentially but well under half that through
    the 16-wide pool (time.sleep releases the GIL like network I/O)."""
    inner = LocalMetaFS()
    fs = DelayFS(inner, delay_s=0.010)
    objs = [str(tmp_path / f"f{i}.json") for i in range(64)]
    for p in objs:
        inner.put_text(p, "x")
    t0 = time.time()
    fs.delete_files(objs)  # DelayFS default pool width: 16
    pooled = time.time() - t0
    assert pooled < 0.32  # sequential would be >= 0.64
    assert fs.op_counts["delete_file"] == 64


def test_planning_is_one_get_after_manifest_compaction(delayroot):
    """The 100k-segment claim at probe scale: N per-segment manifests
    cost N GETs to plan; after compact_manifests, ONE."""
    from datetime import datetime, timedelta, timezone

    fs = get_fs(delayroot)
    fs.delay_s = 0.0  # count requests; don't sleep through the build
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    for i in range(20):
        start = t0 + timedelta(days=i)
        register_manifest(delayroot, SegmentManifest(
            "ds", Interval(start, start + timedelta(days=1)), "v1", 0,
            fs.join(delayroot, "ds", f"d{i}")))
    fs.reset_counts()
    assert len(list_manifests(delayroot, "ds")) == 20
    assert fs.op_counts["read_text"] == 20  # one GET per manifest file
    compact_manifests(delayroot, "ds")
    fs.reset_counts()
    assert len(list_manifests(delayroot, "ds")) == 20
    assert fs.op_counts["read_text"] == 1  # ONE snapshot GET
    assert fs.op_counts["ls"] == 1


def test_vacuum_reads_each_manifest_once(delayroot):
    """r8 fix: the sweep reuses the listing's parsed objects instead of
    re-reading every manifest file (2N -> N+1 GETs)."""
    from datetime import datetime, timedelta, timezone

    from druid_hadoop_utils_spark.sources.maintenance import vacuum

    fs = get_fs(delayroot)
    fs.delay_s = 0.0
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    for i in range(10):
        start = t0 + timedelta(days=i)
        iv = Interval(start, start + timedelta(days=1))
        for v in ("v1", "v2"):
            p = fs.join(delayroot, "ds", f"d{i}_{v}")
            fs.mkdirs(p)
            fs.put_text(fs.join(p, "part-0.parquet"), "x")
            register_manifest(delayroot, SegmentManifest(
                "ds", iv, v, 0, p))
    fs.reset_counts()
    removed = vacuum(delayroot, "ds")
    assert len(removed) == 10
    # 20 manifest reads (the listing) + lease/horizon/tag metadata —
    # crucially NOT 40+ (the old re-read doubled it)
    assert fs.op_counts["read_text"] <= 25, fs.op_counts


def test_publish_metadata_cost_is_one_listing_plus_n_puts(delayroot, spark):
    """The publish path's object-store metadata contract, COUNTED
    (round 11): for N buckets on an empty table, publish_segments costs
    exactly N manifest PUTs + one commit-lease acquisition (1 PUT +
    ≤3 GETs + 1 DELETE), N promote copies, and ONE staging listing —
    never a per-bucket listing, and the round-11 leased registration
    added only the constant lease handshake. At 10k manifests the
    pre-existing-table listing is 1 GET after compact_manifests
    (test_planning_is_one_get_after_manifest_compaction)."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.sources.ingest import publish_segments

    fs = get_fs(delayroot)
    fs.delay_s = 0.0  # count requests; don't sleep through the publish
    base = datetime(2024, 1, 1)
    rows = [Row(ts=base + timedelta(days=d), k="k", v=float(d))
            for d in range(20)]
    df = spark.createDataFrame(rows)
    fs.reset_counts()
    ms = publish_segments(df, delayroot, "t", version="v1",
                          time_column="ts", bucket="DAY")
    n = len(ms)
    assert n == 20
    c = fs.op_counts
    assert c["put_text"] == n + 1          # n manifests + 1 lease PUT
    assert c["copy_tree"] == n             # no-rename promote, 1/bucket
    # staging walk + manifest dir + ONE materialized-rollup discovery
    # LIST (register_pending_states) + ONE post-registration validation
    # LIST (the concurrent-overshadow check) — both round 12, both O(1)
    # per publish, never per bucket
    assert c.get("ls", 0) <= 4
    assert c.get("read_text", 0) <= 3      # lease protocol reads only
    assert c.get("isdir", 0) <= n + 2      # promote dest checks + probes
    assert c.get("delete_file", 0) == 1    # lease release
    assert c.get("delete_dir", 0) == 1     # staging cleanup
