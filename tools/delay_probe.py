#!/usr/bin/env python3
"""Measure the object-store design claims locally via DelayFS (VERDICT
r7 item 1): every metadata round-trip through a ``delaysim://`` root
sleeps an injected RTT, so the two claims that could previously only be
argued from design become numbers:

1. PLANNING at N manifests: ``list_manifests`` costs N GETs raw vs ONE
   after ``compact_manifests`` — measured in wall time AND round-trip
   counts (DelayFS.op_counts), with the extrapolation to a 20 ms S3 RTT.
2. BULK-DELETE POOL WIDTH: reclaiming N objects at pool widths
   1/4/16/32 — the measurement that justifies MetaFS.bulk_parallelism
   defaults (4 local because disk is syscall-bound, 16 remote because
   latency wants overlap).
3. VACUUM at N overshadowed segments end-to-end through the injected
   latency (the sweep is listing + snapshot rewrite + pooled deletes).

Usage: python tools/delay_probe.py [N] [DELAY_MS]   (default 10000, 2.0)
Results land in BASELINE.md's round-8 section by hand.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
DELAY_MS = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
os.environ["SPARK_GRAFT_DELAY_MS"] = str(DELAY_MS)

from druid_hadoop_utils_spark.intervals import Interval  # noqa: E402
from druid_hadoop_utils_spark.sources.fs import get_fs  # noqa: E402
from druid_hadoop_utils_spark.sources.segments import (  # noqa: E402
    SegmentManifest,
    compact_manifests,
    list_manifests,
    register_manifest,
)


def main() -> None:
    base = tempfile.mkdtemp(prefix="delay_probe_")
    root = "delaysim://" + base + "/tbl"
    fs = get_fs(root)
    out: dict = {"n": N, "delay_ms": DELAY_MS}

    # --- build N manifests (not timed: registration is the ingest path)
    print(f"building {N} manifests at {DELAY_MS} ms injected RTT ...",
          flush=True)
    fs.delay_s = 0.0  # build fast; measurements re-enable the delay
    day = 0
    from datetime import datetime, timedelta, timezone

    t0 = datetime(2020, 1, 1, tzinfo=timezone.utc)
    for i in range(N):
        start = t0 + timedelta(days=i)
        iv = Interval(start, start + timedelta(days=1))
        p = fs.join(root, "ds", f"data_{i}")
        fs.mkdirs(p)
        fs.put_text(fs.join(p, "part-0.parquet"), "x")
        register_manifest(root, SegmentManifest("ds", iv, "v1", 0, p))
        day += 1
    fs.delay_s = DELAY_MS / 1000.0

    # --- 1. planning cost: raw per-segment files vs one snapshot
    fs.reset_counts()
    t = time.time()
    ms = list_manifests(root, "ds")
    raw_s = time.time() - t
    raw_gets = dict(fs.op_counts)
    assert len(ms) == N
    fs.delay_s = 0.0
    compact_manifests(root, "ds")
    fs.delay_s = DELAY_MS / 1000.0
    fs.reset_counts()
    t = time.time()
    ms = list_manifests(root, "ds")
    snap_s = time.time() - t
    snap_gets = dict(fs.op_counts)
    assert len(ms) == N
    out["planning"] = {
        "raw_sec": round(raw_s, 3), "raw_ops": raw_gets,
        "snapshot_sec": round(snap_s, 3), "snapshot_ops": snap_gets,
        "extrapolated_s3_20ms_raw_sec": round(
            raw_gets.get("read_text", 0) * 0.020
            + raw_gets.get("ls", 0) * 0.020, 1),
        "extrapolated_s3_20ms_snapshot_sec": round(
            snap_gets.get("read_text", 0) * 0.020
            + snap_gets.get("ls", 0) * 0.020, 3),
    }
    print("planning:", json.dumps(out["planning"]), flush=True)

    # --- 2. delete-pool width sweep over N small objects
    widths = [1, 4, 16, 32]
    sweep = {}
    for w in widths:
        fs.delay_s = 0.0
        objs = [fs.join(root, "junk", f"w{w}_{i}.json") for i in range(N)]
        for p in objs:
            fs.put_text(p, "x")
        fs.delay_s = DELAY_MS / 1000.0
        t = time.time()
        fs.delete_files(objs, parallelism=w)
        sweep[str(w)] = round(time.time() - t, 3)
        print(f"delete_files width={w}: {sweep[str(w)]}s", flush=True)
    out["delete_pool_sweep_sec"] = sweep

    # --- 3. vacuum end-to-end: overshadow everything, sweep under delay
    print("overshadowing all intervals with v2 ...", flush=True)
    fs.delay_s = 0.0
    for i in range(N):
        start = t0 + timedelta(days=i)
        iv = Interval(start, start + timedelta(days=1))
        p = fs.join(root, "ds", f"data2_{i}")
        fs.mkdirs(p)
        fs.put_text(fs.join(p, "part-0.parquet"), "x")
        register_manifest(root, SegmentManifest("ds", iv, "v2", 0, p))
    fs.delay_s = DELAY_MS / 1000.0
    from druid_hadoop_utils_spark.sources.maintenance import vacuum

    fs.reset_counts()
    t = time.time()
    removed = vacuum(root, "ds")
    out["vacuum"] = {
        "removed": len(removed),
        "sec": round(time.time() - t, 3),
        "ops": dict(fs.op_counts),
    }
    print("vacuum:", json.dumps(out["vacuum"]), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
