"""10x DML cost-locality probe (VERDICT r10 item 8).

Builds a 30-day managed events table at ~10x sf0.1 (1M rows), merges a
hot-day update batch into ONE of the 30 days, and measures what the
segment model promises at 100 TB: the merge's cost is proportional to
the AFFECTED bucket, not the table. Reported against the naive
alternative (re-publishing the whole updated table) and verified
structurally: every pre-existing data file is byte-identical after the
merge and the new bytes are ~1/30th of the table.

Usage: python tools/dml_scale_probe.py [N_copies=10]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10


def _tree_stats(root: str):
    """(path -> sha256, total_bytes) over data files (manifests excluded)."""
    hashes, total = {}, 0
    for dirpath, _dirs, files in os.walk(root):
        if "_segments" in dirpath:
            continue
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                hashes[p] = hashlib.sha256(fh.read()).hexdigest()
            total += os.path.getsize(p)
    return hashes, total


def main() -> None:
    from druid_hadoop_utils_spark.session import get_spark
    from druid_hadoop_utils_spark.sources.dml import merge_into
    from druid_hadoop_utils_spark.sources.ingest import publish_segments
    from druid_hadoop_utils_spark.sources.tables import load_table

    spark = get_spark("dml-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="dml_scale_")
    root = os.path.join(work, "tbl")

    ev = load_table(spark, SF_DIR, "events")
    copies = spark.range(COPIES).withColumnRenamed("id", "__copy")
    big = (
        ev.crossJoin(F.broadcast(copies))
        .withColumn("user_id",
                    F.col("user_id") + F.col("__copy") * 1_000_000)
        .drop("__copy")
    )
    publish_segments(big, root, "ev", version="v1", time_column="ts",
                     bucket="DAY")
    n_rows = COPIES * ev.count()
    before, total_bytes = _tree_stats(root)
    n_days = len({p.split("/tbl/ev/")[1].split("/")[0]
                  for p in before})

    # hot-day updates: bump every (user_id, event_type) of day 15 —
    # updates carry the table's FULL schema (replaced rows take the
    # update row whole)
    day15 = (
        spark.read.parquet(*(sorted({os.path.dirname(p) for p in before
                                     if "2024-01-15" in p})))
        .withColumn("value", F.col("value") + 1.0)
        .drop("__bucket")
    )
    t0 = time.perf_counter()
    merge_into(spark, root, "ev", day15, ["user_id", "event_type"],
               bucket="DAY")
    merge_sec = time.perf_counter() - t0

    after, total_after = _tree_stats(root)
    untouched = all(after.get(p) == h for p, h in before.items())
    added = [p for p in after if p not in before]
    bytes_added = sum(os.path.getsize(p) for p in added)
    affected_only = all("2024-01-15" in p for p in added)

    # the naive alternative: republish the WHOLE current table
    current = spark.read.parquet(
        *sorted({os.path.dirname(p) for p in before}))
    t0 = time.perf_counter()
    publish_segments(current.withColumnRenamed("__time", "ts"),
                     os.path.join(work, "naive"), "ev", version="v1",
                     time_column="ts", bucket="DAY")
    full_sec = time.perf_counter() - t0

    print(json.dumps({
        "metric": "dml_scale_probe",
        "copies": COPIES,
        "rows": n_rows,
        "days": n_days,
        "merge_one_day_sec": round(merge_sec, 3),
        "full_republish_sec": round(full_sec, 3),
        "time_ratio": round(merge_sec / full_sec, 3),
        "bytes_total": total_bytes,
        "bytes_written_by_merge": bytes_added,
        "bytes_share": round(bytes_added / total_bytes, 4),
        "pre_existing_files_byte_identical": untouched,
        "new_bytes_confined_to_affected_day": affected_only,
        "load1": os.getloadavg()[0],
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
