"""Reproducible ≥10× paired KLL measurement (VERDICT r5 item 5).

The sub-second sf0.1 pair (engine KLL k=256 vs plain percentile_approx)
flirts with the 2× gate because both sides sit near fixed session floors
(Arrow worker spin-up vs JVM warmth). The meaningful number is the ratio
at a scale where scan cost dominates those floors — this script builds a
key-shifted N× replica of sf0.1 events in /tmp (throwaway), then runs the
pair same-process, alternating, min-of-3 after warm-up, and prints one
JSON line for BASELINE.md.

Usage: python tools/kll_scale_pair.py [N_copies=10]
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


def main() -> None:
    from druid_hadoop_utils_spark.functions.kll import kll_partials, kll_quantiles
    from druid_hadoop_utils_spark.session import get_spark
    from druid_hadoop_utils_spark.sources.tables import load_table

    spark = get_spark("kll-scale-pair")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="kll_scale_")
    big_path = os.path.join(work, "events_big.parquet")
    ev = load_table(spark, SF_DIR, "events")
    copies = spark.range(COPIES).withColumnRenamed("id", "__copy")
    big = (
        ev.crossJoin(F.broadcast(copies))
        .withColumn("value", F.col("value") + F.col("__copy") * 0.001)
        .drop("__copy")
    )
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType", None)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    big.write.mode("overwrite").parquet(big_path)
    if prev is None:
        spark.conf.unset("spark.sql.parquet.outputTimestampType")
    else:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    n_rows = spark.read.parquet(big_path).count()

    def engine():
        df = spark.read.parquet(big_path)
        states = kll_partials(df, "value", ["event_type"], k=256)
        return kll_quantiles(states, ["event_type"], [0.25, 0.5, 0.95])

    def plain():
        return (
            spark.read.parquet(big_path)
            .groupBy("event_type")
            .agg(
                F.percentile_approx("value", [0.25, 0.5, 0.95], 10000)
                .alias("qs")
            )
        )

    # warm both paths (JVM codegen + Python/Arrow worker fork)
    engine().collect()
    plain().collect()

    def best_of(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t = time.time()
            fn().collect()
            best = min(best, time.time() - t)
        return best

    # alternating min-of-3
    e_ts, p_ts = [], []
    for _ in range(3):
        e_ts.append(best_of(engine, 1))
        p_ts.append(best_of(plain, 1))
    e, p = min(e_ts), min(p_ts)
    print(json.dumps({
        "copies": COPIES, "rows": n_rows,
        "engine_kll_k256_sec": round(e, 3),
        "plain_percentile_approx_sec": round(p, 3),
        "ratio": round(e / p, 2),
        "load1": os.getloadavg()[0],
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
