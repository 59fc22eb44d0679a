"""Incremental rollup maintenance on a managed segment table, end to end:

1. publish three day-segments of events;
2. `materialize_aggs` — one small state file PER SEGMENT (count, sums,
   an HLL user sketch), beside the table under `_materialized/daily/`;
3. `query_materialized` — the daily rollup answered from states only
   (raw rows never rescanned), sketches merged and finalized;
4. publish a fourth day → `materialize_aggs` computes ONLY the new
   segment's state (the incremental contract);
5. replace day 2 at a newer version → the old state is never read;
   one catch-up call and the query reflects the replacement;
6. a row-level DML merge → the commit registers the affected segment
   identifiers as pending, and `catch_up_materialized` recomputes
   EXACTLY those (O(affected) — no timeline-wide state probing).

    python examples/materialized_rollup.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from druid_hadoop_utils_spark.session import get_spark  # noqa: E402
from druid_hadoop_utils_spark.sources.ingest import publish_segments  # noqa: E402
from druid_hadoop_utils_spark.sources.materialize import (  # noqa: E402
    catch_up_materialized,
    materialize_aggs,
    query_materialized,
)
from druid_hadoop_utils_spark.sources.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
AGGS = [
    {"type": "count", "name": "n"},
    {"type": "doubleSum", "name": "value", "fieldName": "value"},
    {"type": "hyperUnique", "name": "users", "fieldName": "user_id"},
]


def main() -> None:
    spark = get_spark("materialized-rollup-example")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="mat_example_")
    ev = load_table(spark, SF_DIR, "events").select(
        "ts", "event_type", "value", "user_id")

    # 1-2: publish + materialize
    first = ev.where(F.col("ts") < F.lit("2024-01-04").cast("timestamp"))
    publish_segments(first, root, "events", version="v1",
                     time_column="ts", bucket="DAY")
    done = materialize_aggs(spark, root, "events", "daily",
                            ["event_type"], AGGS)
    print(f"materialized {len(done)} segment states: {done}")

    # 3: states-only query
    print("daily rollup from states (no raw rescan):")
    query_materialized(spark, root, "events", "daily").orderBy(
        "__time", "event_type").show(8, truncate=False)

    # 4: a new day costs exactly one segment's scan
    day4 = ev.where(
        (F.col("ts") >= F.lit("2024-01-04").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-05").cast("timestamp")))
    publish_segments(day4, root, "events", version="v1",
                     time_column="ts", bucket="DAY")
    done = materialize_aggs(spark, root, "events", "daily",
                            ["event_type"], AGGS)
    print(f"incremental catch-up computed ONLY: {done}")

    # 5: replace day 2 — overshadowed state never read again
    day2 = ev.where(
        (F.col("ts") >= F.lit("2024-01-02").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-03").cast("timestamp"))
    ).withColumn("value", F.col("value") * 0)
    publish_segments(day2, root, "events", version="v2",
                     time_column="ts", bucket="DAY")
    done = materialize_aggs(spark, root, "events", "daily",
                            ["event_type"], AGGS)
    print(f"after day-2 replacement, caught up: {done}")
    query_materialized(
        spark, root, "events", "daily",
        interval="2024-01-02/2024-01-03").show(truncate=False)

    # 6: DML → commit-driven catch-up, O(affected)
    from druid_hadoop_utils_spark.sources.dml import merge_into

    fix = spark.createDataFrame(
        [("2024-01-03 01:00:00", "click", 999.0, 1)],
        "ts string, event_type string, value double, user_id bigint",
    ).select(F.col("ts").cast("timestamp").alias("__time"),
             "event_type", "value", "user_id")
    merge_into(spark, root, "events", fix, ["event_type"])
    done = catch_up_materialized(spark, root, "events")
    print(f"commit-driven catch-up recomputed exactly: {done}")
    query_materialized(
        spark, root, "events", "daily",
        interval="2024-01-03/2024-01-04").show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
