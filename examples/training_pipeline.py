"""End-to-end training-data curation pipeline — the extension story
(SURVEY.md §7.3 M8) on the real documents/embeddings corpus:

    raw documents
      → text analysis (tokens / language / quality features)
      → quality gate
      → exact dedup (hash groupBy)
      → MinHash-LSH near-dup CLUSTER removal (connected components,
        keep one doc per cluster)
      → embedding near-dup pruning (cosine threshold)
      → deterministic train/valid/test hash split
      → clean corpus + summary stats

Every stage is a DataFrame transform built for 100 TB: no driver-side
loops over data, no cross joins in the scale paths, one shuffle per stage
(components iterate O(log diameter) rounds with checkpointed lineage).

Usage: python examples/training_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators import dedup as D
from druid_hadoop_utils_spark.operators import similarity as S
from druid_hadoop_utils_spark.operators import text as T
from druid_hadoop_utils_spark.session import get_spark
from druid_hadoop_utils_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("training-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    n0 = docs.count()

    # 1. analyze + quality gate
    analyzed = T.with_text_analysis(docs)
    kept = analyzed.where(F.col("quality_keep") == 1)
    n1 = kept.count()

    # 2. exact dedup on normalized text
    deduped = D.exact_dedup(
        kept.withColumn("__norm", T.normalize_text("text")), ["__norm"], "doc_id"
    ).drop("__norm")
    n2 = deduped.count()

    # 3. near-dup CLUSTER removal: LSH pairs -> connected components ->
    #    keep exactly one doc (the min id) per cluster, not per pair
    neardeduped = D.neardup_dedup(deduped, "doc_id", threshold=0.5)
    n3 = neardeduped.count()

    # 4. embedding near-dup pruning (vec_id aligns with doc_id in testdata)
    epairs = S.similar_pairs(emb, threshold=0.35)
    edrop = epairs.select(F.col("id_b").alias("doc_id")).distinct()
    final = neardeduped.join(edrop, "doc_id", "left_anti")
    n4 = final.count()

    # 5. mixture weighting: rebalance the clean pool to the target source
    #    composition (binding source sets the scale — no oversampling)
    from druid_hadoop_utils_spark.operators.sampling import hash_split, mix_sources

    mixed = mix_sources(final, "doc_id", "lang",
                        {"en": 0.5, "zh": 0.2, "es": 0.15, "de": 0.15})
    n5 = mixed.count()

    # 6. deterministic, layout-independent train/valid/test assignment
    split = hash_split(mixed, "doc_id",
                       {"train": 0.9, "valid": 0.05, "test": 0.05})

    # 7. sequence packing: assign the train split to fixed-token-budget
    #    packs (distributed prefix sum — no single-partition window)
    from druid_hadoop_utils_spark.operators.packing import pack_documents, pack_stats

    packed = pack_documents(split.where(F.col("split") == "train"),
                            "doc_id", "n_tokens", budget=2048)
    fill = pack_stats(packed, "n_tokens", 2048).agg(
        F.count("*").alias("packs"),
        F.round(F.avg("fill_ratio"), 3).alias("avg_fill"),
    ).first()

    # 8. corpus stats per split and language
    stats = split.groupBy("split", "pred_lang").agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.round(F.avg("nonalpha_ratio"), 4).alias("avg_nonalpha"),
    )
    stats.orderBy("split", F.desc("docs")).show()
    print(
        f"pipeline: {n0} raw -> {n1} quality-kept -> {n2} exact-deduped "
        f"-> {n3} cluster-deduped -> {n4} embedding-pruned -> "
        f"{n5} mixture-weighted -> {fill.packs} train packs "
        f"(avg fill {fill.avg_fill})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
