"""End-to-end training-data curation pipeline — the extension story
(SURVEY.md §7.3 M8) on the real documents/embeddings corpus:

    raw documents
      → incremental dedup against the previous snapshot's
        fingerprint manifest (only genuinely new content proceeds)
      → text analysis (tokens / language / quality features)
      → quality gate + corpus-trained bigram LM score filter
      → exact dedup (hash groupBy)
      → MinHash-LSH near-dup CLUSTER removal (connected components,
        keep one doc per cluster)
      → embedding near-dup pruning (cosine threshold)
      → leakage-safe (content-keyed) train/valid/test split
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

    all_docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 0. incremental ingest: docs < 300 stand in for the PREVIOUS
    #    snapshot — its persisted fingerprint manifest is all the new
    #    batch ever reads of it (never the old text)
    manifest = D.fingerprint_manifest(all_docs.where(F.col("doc_id") < 300))
    docs = D.incremental_dedup(
        all_docs.where(F.col("doc_id") >= 300), manifest, "doc_id")
    n0 = docs.count()

    # 0b. FEED-DRIVEN incremental NEAR-dedup (round 13 — the round-12
    #     change feed and managed signature manifests composing): the
    #     corpus lives in a MANAGED segment table whose previous crawl
    #     persisted per-segment minhash signature files (~512 B/doc).
    #     When the next crawl publishes, the checkpointed consumer
    #     discovers exactly the new rows via the change feed (O(changed
    #     bytes) — never a re-scan of history), the commit-driven
    #     pending markers make catch_up re-sign ONLY the new segments,
    #     and the band join runs new-docs × stored-signatures. At 100 TB
    #     this is the every-crawl-increment loop: history contributes
    #     integer signature scans, its text is never re-read.
    import shutil
    import tempfile

    from druid_hadoop_utils_spark import (
        catch_up_materialized,
        commit_consumed,
        consume_changes,
        materialize_signatures,
        publish_segments,
        read_signatures,
    )

    root = tempfile.mkdtemp(prefix="training_pipeline_docs_")
    ckpt = os.path.join(root, "dedup_consumer.json")
    # crawl 1 (the history snapshot): publish + sign + mark consumed
    hist = all_docs.where(F.col("doc_id") < 300).withColumn(
        "__time", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    publish_segments(hist, root, "docs", version="v1", bucket="DAY")
    materialize_signatures(spark, root, "docs", "sigs", "doc_id")
    _, tok = consume_changes(spark, root, "docs", ckpt)
    commit_consumed(ckpt, tok)

    # crawl 2 lands as a new bucket; the feed delivers ONLY its rows
    crawl2 = docs.withColumn(
        "__time", F.lit("2024-01-02 00:00:00").cast("timestamp"))
    publish_segments(crawl2, root, "docs", version="v1", bucket="DAY")
    feed, tok2 = consume_changes(spark, root, "docs", ckpt)
    new_docs = (feed.where(F.col("_change_type") == "insert")
                .drop("_change_type", "_n", "__time"))
    # pending markers from the publish drive the signature catch-up:
    # only crawl 2's segment shingles (caught = {'sigs': [that one id]})
    caught = catch_up_materialized(spark, root, "docs", "sigs")
    sig_manifest = read_signatures(spark, root, "docs", "sigs")
    near_hist = D.incremental_neardup_pairs(
        new_docs, sig_manifest, "doc_id", threshold=0.8)
    # drop only new docs that near-dup HISTORY (one pair side < 300);
    # within-batch near-dups are step 3's quality-aware cluster removal
    hist_dup_ids = (
        near_hist.where((F.col("id_a") < 300) | (F.col("id_b") < 300))
        .select(F.greatest("id_a", "id_b").alias("doc_id")).distinct())
    docs = new_docs.join(hist_dup_ids, "doc_id", "left_anti")
    n0b = docs.count()
    commit_consumed(ckpt, tok2)  # the increment is durably processed
    print(f"feed-driven near-dedup: re-signed segments {caught}")
    # NOTE: `docs` now reads lazily from the managed table — the temp
    # root is removed at the END of main(), after every downstream
    # stage has evaluated

    # 1. analyze + quality gate + LM-score filter (corpus as its own
    #    language model: drop the least-typical tail). LEFT join: a doc
    #    too short to have bigrams has no LM evidence against it and
    #    passes to the quality gate untouched.
    analyzed = T.with_text_analysis(docs)
    lm = T.lm_score(docs)
    qs = lm.approxQuantile("avg_logp", [0.05], 0.001)
    cut = qs[0] if qs else float("-inf")
    kept = (analyzed.join(lm.select("doc_id", "avg_logp"), "doc_id", "left")
            .where((F.col("quality_keep") == 1)
                   & (F.col("avg_logp").isNull()
                      | (F.col("avg_logp") >= cut))))
    n1 = kept.count()

    # 2. exact dedup on normalized text
    deduped = D.exact_dedup(
        kept.withColumn("__norm", T.normalize_text("text")), ["__norm"], "doc_id"
    ).drop("__norm")
    n2 = deduped.count()

    # 3. near-dup CLUSTER removal, quality-aware (round 5): LSH pairs ->
    #    connected components -> keep the LONGEST doc per cluster (ties
    #    by min id), not whichever crawled first
    pairs = D.minhash_lsh_dedup_pairs(deduped, "doc_id", threshold=0.5)
    neardeduped = D.dedup_keep_best(deduped, "doc_id", pairs, "n_chars")
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

    # 6. leakage-safe split: assignment keyed on the CONTENT fingerprint,
    #    so any surviving duplicate pair can never straddle train/test
    from druid_hadoop_utils_spark.operators.sampling import leakage_safe_split

    split = leakage_safe_split(mixed, "text",
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

    # 8. the release data card (round 5): per-split counts, volume,
    #    exact-dup rate (should be 0 after the dedup stages) and exact
    #    median length — the table the corpus ships with
    T.corpus_report(split, group_cols=["split"]) \
        .orderBy("split").show(truncate=False)
    stats = split.groupBy("split", "pred_lang").agg(
        F.count("*").alias("docs"),
        F.sum("n_tokens").alias("tokens"),
        F.round(F.avg("nonalpha_ratio"), 4).alias("avg_nonalpha"),
    )
    stats.orderBy("split", F.desc("docs")).show()
    print(
        f"pipeline: {n0} new-after-incremental -> {n0b} after "
        f"near-dedup-vs-history -> {n1} quality+LM-kept "
        f"-> {n2} exact-deduped "
        f"-> {n3} cluster-deduped -> {n4} embedding-pruned -> "
        f"{n5} mixture-weighted -> {fill.packs} train packs "
        f"(avg fill {fill.avg_fill})"
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
