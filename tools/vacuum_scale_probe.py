"""Vacuum-sweep scaling probe (VERDICT r6 item 6): time the metadata
sweeps at 10k+ entries so the listing cost is MEASURED, not guessed —
both on the local backend and through the object-store simulation's
pointer protocol (which doubles the entry count: pointer + token dir).

The entries are fabricated driver-side (mkdir + marker files) — the
sweeps never read parquet contents, so this measures exactly what a
10k-entry production table would pay: one directory listing per key
plus one stat/remove per stale entry.

Usage: python tools/vacuum_scale_probe.py [n_entries]
Prints one JSON line per scenario.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from druid_hadoop_utils_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000


def _make_table(spark, root):
    from datetime import datetime

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.sources.ingest import publish_segments

    rows = [Row(ts=datetime(2024, 1, 1, h), v=float(h)) for h in range(4)]
    publish_segments(spark.createDataFrame(rows), root, "ev", version="v1",
                     time_column="ts", bucket="DAY")


def probe_result_cache(spark, scheme: str) -> dict:
    from druid_hadoop_utils_spark.sources.cache import (
        CACHE_DIR,
        vacuum_result_cache,
    )
    from druid_hadoop_utils_spark.sources.fs import get_fs

    base = tempfile.mkdtemp(prefix="vacuum_probe_")
    root = base if scheme == "local" else "objectsim://" + base
    _make_table(spark, root)
    fs = get_fs(root)
    cdir = fs.join(root, "ev", CACHE_DIR)
    # N stale entries: distinct keys, each with one entry at a bogus
    # (never-current) timeline stamp, in the committed shape the backend
    # family uses (plain dir with _SUCCESS / token dir + pointer)
    t0 = time.time()
    for i in range(N):
        kdir = fs.join(cdir, f"key{i:06d}")
        if fs.atomic_dir_rename:
            vdir = fs.join(kdir, "deadbeefdeadbeefdeadbeef")
            fs.mkdirs(vdir)
            fs.put_text(fs.join(vdir, "_SUCCESS"), "")
        else:
            vdir = fs.join(kdir, "deadbeefdeadbeefdeadbeef.tok0")
            fs.mkdirs(vdir)
            fs.put_text(fs.join(vdir, "part-0.parquet"), "x")
            fs.put_text(fs.join(kdir, "deadbeefdeadbeefdeadbeef.ptr.json"),
                        json.dumps({"dir": "deadbeefdeadbeefdeadbeef.tok0"}))
    setup_s = time.time() - t0

    t0 = time.time()
    dry = vacuum_result_cache(root, "ev", dry_run=True)
    dry_s = time.time() - t0
    t0 = time.time()
    removed = vacuum_result_cache(root, "ev")
    sweep_s = time.time() - t0
    assert len(dry) == N and len(removed) == N, (len(dry), len(removed))
    shutil.rmtree(base, ignore_errors=True)
    return {"probe": f"result_cache_{scheme}", "entries": N,
            "setup_s": round(setup_s, 2), "dry_run_s": round(dry_s, 2),
            "sweep_s": round(sweep_s, 2)}


def probe_materialized(spark, scheme: str) -> dict:
    """10k orphan state files under one rollup dir (the worst case a
    compaction-heavy table accumulates between vacuums)."""
    from druid_hadoop_utils_spark.sources.fs import get_fs
    from druid_hadoop_utils_spark.sources.materialize import (
        vacuum_materialized,
    )

    base = tempfile.mkdtemp(prefix="vacuum_probe_mat_")
    root = base if scheme == "local" else "objectsim://" + base
    _make_table(spark, root)
    fs = get_fs(root)
    mdir = fs.join(root, "ev", "_materialized", "daily")
    fs.mkdirs(mdir)
    fs.put_text(fs.join(mdir, "spec.json"), "{}")
    t0 = time.time()
    for i in range(N):
        dest = fs.join(mdir, f"ev_ghost_{i:06d}.parquet")
        if fs.atomic_dir_rename:
            fs.mkdirs(dest)
            fs.put_text(fs.join(dest, "_SUCCESS"), "")
        else:
            tok = f"{dest}.tok0"
            fs.mkdirs(tok)
            fs.put_text(fs.join(tok, "part-0.parquet"), "x")
            fs.put_text(dest + ".ptr.json",
                        json.dumps({"dir": fs.name(tok)}))
    setup_s = time.time() - t0
    t0 = time.time()
    gone = vacuum_materialized(root, "ev", "daily", tmp_min_age_s=0)
    sweep_s = time.time() - t0
    assert len(gone) == N, len(gone)
    shutil.rmtree(base, ignore_errors=True)
    return {"probe": f"materialized_{scheme}", "entries": N,
            "setup_s": round(setup_s, 2), "sweep_s": round(sweep_s, 2)}


if __name__ == "__main__":
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("vacuum-probe")
    for scheme in ("local", "objectsim"):
        print(json.dumps(probe_result_cache(spark, scheme)))
        print(json.dumps(probe_materialized(spark, scheme)))
    spark.stop()
