"""Change-feed cost-locality probe (round 12).

Builds the same ~10x 30-day managed table as dml_scale_probe, merges a
hot-day batch into ONE of the 30 days, then measures the claim behind
``read_changes``: the feed's cost is proportional to the CHANGED
bucket, not the table.

- engine feed: ``read_changes(t0)`` — file set from the metadata diff,
  netting aggregate over changed rows only. Reported: wall time, files
  scanned, bytes scanned (both as a share of the table).
- naive CDC: the full-outer alternative every snapshot-diff pipeline
  ships first — read view A (time travel) and view B in full, net them
  by full-row multiset. Same answer, O(table) scans + an O(table)
  shuffle. Reported: wall time + the ratio.

Usage: python tools/changes_scale_probe.py [N_copies=10]
Prints one JSON line for BASELINE.md.
"""

from __future__ import annotations

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
T1 = "2024-06-01T00:00:00+00:00"


def _data_files(root: str):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        if "_segments" in dirpath:
            continue
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.path.getsize(p)
    return out


def main() -> None:
    from druid_hadoop_utils_spark.session import get_spark
    from druid_hadoop_utils_spark.sources.changes import read_changes
    from druid_hadoop_utils_spark.sources.dml import merge_into
    from druid_hadoop_utils_spark.sources.ingest import publish_segments
    from druid_hadoop_utils_spark.sources.tables import load_table

    spark = get_spark("changes-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="chg_scale_")
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
                     bucket="DAY", published_at=T1)
    n_rows = COPIES * ev.count()
    before = _data_files(root)
    total_bytes = sum(before.values())

    day15 = (
        spark.read.parquet(*(sorted({os.path.dirname(p) for p in before
                                     if "2024-01-15" in p})))
        .withColumn("value", F.col("value") + 1.0)
        .drop("__bucket")
    )
    merge_into(spark, root, "ev", day15, ["user_id", "event_type"],
               bucket="DAY")

    # --- engine feed: O(changed bucket)
    t0 = time.perf_counter()
    feed = read_changes(spark, root, "ev", T1)
    counts = {r["_change_type"]: r["n"] for r in
              feed.groupBy("_change_type").agg(
                  F.sum("_n").alias("n")).collect()}
    feed_sec = time.perf_counter() - t0
    scanned = [f.removeprefix("file://") for f in feed.inputFiles()]
    scanned_bytes = sum(os.path.getsize(p) for p in scanned)

    # --- physical mode (round 13): same file locality, no netting —
    # the replicator's cost is BOTH whole sides of the changed bucket
    t0 = time.perf_counter()
    phys = read_changes(spark, root, "ev", T1, mode="physical")
    phys_counts = {r["_change_type"]: r["n"] for r in
                   phys.groupBy("_change_type").agg(
                       F.sum("_n").alias("n")).collect()}
    phys_sec = time.perf_counter() - t0
    phys_scanned = {f.removeprefix("file://") for f in phys.inputFiles()}

    # --- naive CDC: two full snapshot scans + full-table netting
    spec_cols = big.columns
    t0 = time.perf_counter()
    from druid_hadoop_utils_spark.plans.planner import load

    spec = {"granularity": "NONE",
            "dimensions": [c for c in spec_cols
                           if c not in ("ts", "value")],
            "metrics": [{"name": "value", "type": "double"}]}
    iv = "2024-01-01/2024-03-01"
    a = load(spark, root, spec, interval=iv, data_source="ev", as_of=T1)
    b = load(spark, root, spec, interval=iv, data_source="ev")
    cols = a.columns
    both = (b.withColumn("__s", F.lit(1))
            .unionByName(a.withColumn("__s", F.lit(-1))))
    naive = (both.groupBy(*cols).agg(F.sum("__s").alias("__net"))
             .where(F.col("__net") != 0))
    naive_counts = {r["k"]: r["n"] for r in
                    naive.groupBy(F.when(F.col("__net") > 0, "insert")
                                  .otherwise("delete").alias("k"))
                    .agg(F.sum(F.abs(F.col("__net"))).alias("n"))
                    .collect()}
    naive_sec = time.perf_counter() - t0

    print(json.dumps({
        "metric": "changes_scale_probe",
        "copies": COPIES,
        "rows": n_rows,
        "feed_counts": counts,
        "naive_counts_match": naive_counts == counts,
        "feed_sec": round(feed_sec, 3),
        "naive_cdc_sec": round(naive_sec, 3),
        "speedup": round(naive_sec / feed_sec, 2),
        "files_scanned": len(set(scanned)),
        "files_total": len(before) + 1,
        "bytes_scanned_share": round(scanned_bytes / total_bytes, 4),
        "physical_sec": round(phys_sec, 3),
        "physical_counts": phys_counts,
        "physical_files_scanned": len(phys_scanned),
        "physical_same_file_locality": phys_scanned == set(scanned),
        "load1": os.getloadavg()[0],
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
