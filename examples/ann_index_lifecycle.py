"""The ANN index lifecycle on a managed embedding table, end to end:

1. publish embedding segments into a managed table;
2. TRAIN ONCE at publish time (`publish_ann_index`) — the artifact
   (IVF centroids + PQ codebooks, a few hundred KB) lands beside
   `_segments/`, stamped with the segment-timeline version;
3. query with `ivf_topk(index=...)` — no driver-side sampling or
   k-means at query time, the index rides to executors as a closure;
4. republish → the stale artifact is REFUSED → retrain.

    python examples/ann_index_lifecycle.py [sf_dir]
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from druid_hadoop_utils_spark.operators import similarity as S  # noqa: E402
from druid_hadoop_utils_spark.plans.planner import load  # noqa: E402
from druid_hadoop_utils_spark.session import get_spark  # noqa: E402
from druid_hadoop_utils_spark.sources.ingest import publish_segments  # noqa: E402
from druid_hadoop_utils_spark.sources.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
SPEC = {"granularity": "NONE", "dimensions": ["vec_id"],
        "metrics": [{"name": "embedding", "type": "complex"}]}


def main() -> None:
    spark = get_spark("ann-index-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="ann_lifecycle_")

    # 1. publish the embedding corpus as a managed segment table
    emb = load_table(spark, SF_DIR, "embeddings").withColumn(
        "ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    publish_segments(emb, root, "emb", version="v1", time_column="ts",
                     bucket="DAY")

    # 2. train once, persist beside _segments/ (timeline-stamped);
    #    refine_iters runs distributed full-corpus Lloyd's passes after
    #    the sample-seeded k-means — publish time is where full scans
    #    belong, so query time never pays them
    path = S.publish_ann_index(spark, root, "emb", spec=SPEC,
                               n_cells=16, m=8, ks=16, refine_iters=1)
    print(f"index artifact: {path}")

    # 3. query time: load the artifact, run distributed-only ANN
    idx = S.load_published_ann_index(root, "emb")
    corpus = load(spark, root, SPEC, interval="1970-01-01/3000-01-01",
                  data_source="emb")
    queries = corpus.where(F.col("vec_id") < 3)
    S.ivf_topk(corpus, queries, k=3, nprobe=4, id_col="vec_id",
               index=idx).show()

    # 4. the corpus changes -> the old artifact refuses to load
    publish_segments(emb.where(F.col("vec_id") % 2 == 0), root, "emb",
                     version="v2", time_column="ts", bucket="DAY")
    try:
        S.load_published_ann_index(root, "emb")
        raise AssertionError("stale index should have been refused")
    except ValueError as e:
        print(f"stale artifact refused as expected: {e}")
    S.publish_ann_index(spark, root, "emb", spec=SPEC, n_cells=16, m=8, ks=16)
    print("retrained against the new timeline:",
          S.load_published_ann_index(root, "emb")["corpus_version"])

    # 5. or let the ensure-current policy decide (round 12): retrains
    # ONLY when absent/stale — safe to call before every query batch
    idx, refreshed = S.refresh_ann_index(spark, root, "emb", spec=SPEC,
                                         n_cells=16, m=8, ks=16)
    print(f"refresh_ann_index: refreshed={refreshed} (fresh artifact)")

    # 6. drift tolerance (round 12): a small DML flips the timeline
    # version, but a k-means quantizer is a density sketch — under
    # max_drift_fraction the policy measures the net changed rows since
    # TRAINING via the change feed (O(changed bytes)) and re-stamps the
    # artifact instead of paying a full retrain. At 100 TB this is the
    # difference between a metadata put and a corpus encode pass per
    # daily merge.
    from druid_hadoop_utils_spark.sources.dml import delete_where

    delete_where(spark, root, "emb",
                 {"type": "selector", "dimension": "vec_id", "value": "0"})
    idx, refreshed = S.refresh_ann_index(spark, root, "emb",
                                         max_drift_fraction=0.05,
                                         spec=SPEC, n_cells=16, m=8, ks=16)
    print(f"after tiny DML with max_drift_fraction=0.05: "
          f"refreshed={refreshed} (re-stamped, no retrain)")

    # 7. persisted IVF postings (round 12): move the per-query corpus
    # cell-assignment pass to publish time. Cell-partitioned files +
    # the probed-cell IN filter mean a query reads ~nprobe/n_cells of
    # the postings bytes (BASELINE: 2.8x at 200k vectors, widening
    # with corpus size). Drift re-stamps keep postings valid; only a
    # real retrain forces a rebuild.
    from druid_hadoop_utils_spark.sources.materialize import (
        materialize_postings,
        read_postings,
    )

    built = materialize_postings(spark, root, "emb", "ivf")
    post = read_postings(spark, root, "emb", "ivf")
    print(f"postings: {len(built)} segment file(s), {post.count()} rows")
    S.ivf_topk_from_postings(post, queries, k=3, nprobe=4,
                             index=idx).show(5)
    spark.stop()


if __name__ == "__main__":
    main()
