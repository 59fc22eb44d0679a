"""Timeline-op scaling probe (round 7): time the NEW metadata operations
— create_tag, restore_to, and the refcounted vacuum behind it — at 10k+
manifests, so their cost at a production manifest count is MEASURED,
not guessed. All three are driver-side metadata sweeps: one manifest
listing plus O(n) small writes/deletes; no data is read or moved
(restore_to re-announces EXISTING data dirs).

Fabricated table: n day-segments at v1, the second half overshadowed by
v2 — restore_to("tag:pre-fix") re-announces all n v1 segments, and the
following vacuum must reclaim the 1.5n overshadowed manifests while
keeping every re-announced (path-shared) data dir.

Usage: python tools/timeline_scale_probe.py [n_segments]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from datetime import datetime, timedelta, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from druid_hadoop_utils_spark.intervals import Interval  # noqa: E402
from druid_hadoop_utils_spark.sources.maintenance import (  # noqa: E402
    restore_to,
    vacuum,
)
from druid_hadoop_utils_spark.sources.segments import (  # noqa: E402
    SegmentManifest,
    create_tag,
    delete_tag,
    list_manifests,
    register_manifest,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
T1 = "2024-06-01T00:00:00+00:00"
T2 = "2024-06-02T00:00:00+00:00"


def main() -> None:
    root = tempfile.mkdtemp(prefix="timeline_probe_")
    ds = "ev"
    day0 = datetime(2020, 1, 1, tzinfo=timezone.utc)

    t0 = time.time()
    for i in range(N):
        iv = Interval(day0 + timedelta(days=i), day0 + timedelta(days=i + 1))
        p = os.path.join(root, ds, f"d{i}", "v=v1")
        os.makedirs(p)
        register_manifest(root, SegmentManifest(ds, iv, "v1", 0, p,
                                                published_at=T1))
    for i in range(N // 2, N):
        iv = Interval(day0 + timedelta(days=i), day0 + timedelta(days=i + 1))
        p = os.path.join(root, ds, f"d{i}", "v=v2")
        os.makedirs(p)
        register_manifest(root, SegmentManifest(ds, iv, "v2", 0, p,
                                                published_at=T2))
    fabricate_s = time.time() - t0

    t0 = time.time()
    create_tag(root, ds, "pre-fix", as_of="2024-06-01T12:00:00")
    tag_s = time.time() - t0

    t0 = time.time()
    announced = restore_to(root, ds, "tag:pre-fix")
    restore_s = time.time() - t0
    assert len(announced) == N, len(announced)

    delete_tag(root, ds, "pre-fix")
    t0 = time.time()
    removed = vacuum(root, ds)
    vacuum_s = time.time() - t0
    assert len(removed) == N + N // 2, len(removed)
    # every re-announced (shared) data dir survived the refcount guard
    survivors = [m for m in list_manifests(root, ds) if not m.tombstone]
    assert len(survivors) == N
    missing = [m.path for m in survivors if not os.path.isdir(m.path)]
    assert not missing, missing[:10]

    print(json.dumps({
        "n_segments": N,
        "fabricate_sec": round(fabricate_s, 2),
        "create_tag_sec": round(tag_s, 2),
        "restore_sec": round(restore_s, 2),
        "vacuum_after_restore_sec": round(vacuum_s, 2),
        "removed": len(removed),
    }))


if __name__ == "__main__":
    main()
