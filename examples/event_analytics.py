"""Interactive-analytics workload tour — the dashboard questions a Druid
deployment answers daily (the reference feeds exactly such a cluster;
reference: druid_exporter.pig:6-17 is the ingest side of this story),
expressed as engine operators over the events table:

    hourly rollup               (granularity read path)
      → smoothing + deltas      (trailing moving average, rate of change)
      → anomaly flags           (z-score AND robust MAD variants)
    ordered funnel              (view → click → purchase, 1-day horizon)
    cohort retention triangle   (weekly, high-value activity)
    transition matrix           (Sankey / next-event input)
    DAU/WAU stickiness          (engagement depth)
    hybrid retrieval            (BM25 ⊕ embedding cosine via RRF,
                                 over the documents/embeddings corpus)

Usage: python examples/event_analytics.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators import timeseries as TS
from druid_hadoop_utils_spark.operators.events import (
    cohort_retention,
    event_transitions,
    funnel_counts,
    stickiness,
)
from druid_hadoop_utils_spark.operators.search import hybrid_search
from druid_hadoop_utils_spark.session import get_spark
from druid_hadoop_utils_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("event-analytics-example")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events")

    print("=== hourly series: smoothing, deltas, anomalies ===")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.round(F.sum("value"), 2).alias("v"))
    series = TS.smooth(hourly, ["event_type"], "h", "v", preceding=3)
    series = TS.delta(series, ["event_type"], "h", "v")
    series = TS.mad_outliers(series, ["event_type"], "v")
    series.where("is_outlier").orderBy("event_type", "h").show(5)

    print("=== funnel: view -> click -> purchase, 1-day horizon ===")
    funnel_counts(
        ev, ["view", "click", "purchase"], within_seconds=86400
    ).show()

    print("=== weekly cohort retention (value >= 100 activity) ===")
    cohort_retention(ev.where(F.col("value") >= 100)).show()

    print("=== transition matrix (top 5 by volume) ===")
    event_transitions(ev).orderBy(F.desc("n")).show(5)

    print("=== weekly DAU/WAU stickiness ===")
    stickiness(ev).show()

    print("=== hybrid retrieval: BM25 + cosine, RRF-fused top 5 ===")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.where(F.col("vec_id") == 0)
    hybrid_search(docs, emb, ["join", "spark", "table"], qv, k=5).show()

    spark.stop()


if __name__ == "__main__":
    main()
