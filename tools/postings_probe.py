"""IVF postings query-cost probe (round 12).

Replicates the embeddings table N× (default 20 → ~100k vectors at
sf0.1), publishes it as a managed table with a trained index, then
times the same top-k query batch two ways, warm, min-of-3:

- ``ivf_topk``: corpus cell assignment happens IN the query (one Arrow
  pass over every corpus vector, every time).
- ``ivf_topk_from_postings``: assignment read from the materialized
  postings files; only the (tiny, broadcast) query side crosses to
  Python.

Same index, same nprobe, same candidates → identical results
(asserted); the delta is pure query-time assignment cost, which grows
with the corpus while the postings path grows with candidate volume.

Usage: python tools/postings_probe.py [N_copies=20]
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
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def main() -> None:
    from druid_hadoop_utils_spark.operators import similarity as S
    from druid_hadoop_utils_spark.plans.planner import load
    from druid_hadoop_utils_spark.session import get_spark
    from druid_hadoop_utils_spark.sources.ingest import publish_segments
    from druid_hadoop_utils_spark.sources.materialize import (
        materialize_postings,
        read_postings,
    )
    from druid_hadoop_utils_spark.sources.tables import load_table

    spark = get_spark("postings-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="postings_probe_")
    root = os.path.join(work, "tbl")

    emb = load_table(spark, SF_DIR, "embeddings")
    copies = spark.range(COPIES).withColumnRenamed("id", "__copy")
    big = (emb.crossJoin(F.broadcast(copies))
           .withColumn("vec_id",
                       F.col("vec_id") + F.col("__copy") * 10_000_000)
           .drop("__copy")
           .withColumn("ts", F.lit("2024-01-01 00:00:00")
                       .cast("timestamp")))
    publish_segments(big, root, "emb", version="v1", time_column="ts",
                     bucket="DAY")
    n = big.count()

    spec = {"granularity": "NONE", "dimensions": ["vec_id", "label"],
            "metrics": [{"name": "embedding", "type": "complex"}]}
    S.publish_ann_index(spark, root, "emb", spec=spec, n_cells=64,
                        sample=4096)
    idx = S.load_published_ann_index(root, "emb")
    t0 = time.perf_counter()
    materialize_postings(spark, root, "emb", "ivf")
    build_sec = time.perf_counter() - t0

    corpus = load(spark, root, spec, interval="1970-01-01/3000-01-01",
                  data_source="emb")
    post = read_postings(spark, root, "emb", "ivf")
    queries = corpus.where(F.col("vec_id") < 8)

    def run(df) -> float:
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            df().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t)
        return best

    raw_q = lambda: S.ivf_topk(corpus, queries, k=5, nprobe=8, index=idx)
    post_q = lambda: S.ivf_topk_from_postings(post, queries, k=5,
                                              nprobe=8, index=idx)
    run(raw_q), run(post_q)  # warm both paths
    raw_sec, post_sec = run(raw_q), run(post_q)

    same = sorted(map(tuple, raw_q().collect())) == \
        sorted(map(tuple, post_q().collect()))

    print(json.dumps({
        "metric": "postings_probe",
        "copies": COPIES,
        "corpus_rows": n,
        "n_cells": 64,
        "nprobe": 8,
        "query_assign_sec": round(raw_sec, 3),
        "postings_sec": round(post_sec, 3),
        "speedup": round(raw_sec / post_sec, 2),
        "postings_build_sec": round(build_sec, 3),
        "results_identical": same,
        "load1": os.getloadavg()[0],
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
