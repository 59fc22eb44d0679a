"""Demonstrate the dedup cache-lifecycle fix: repeated
minhash_lsh_dedup_pairs invocations must NOT accumulate
CacheManager-pinned RDDs. With the old persist() code every call leaked
one shingle cache for the session lifetime; with localCheckpoint the
blocks are ContextCleaner-reclaimed after the frame is GC'd.

Prints the persistent-RDD count after each of N invocations (frame
dropped + gc between), for the repo named on the command line.
Usage: python tools/cache_leak_probe.py [repo_dir] [n_calls]
"""
import gc
import sys
import time

REPO = sys.argv[1] if len(sys.argv) > 1 else __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5
sys.path.insert(0, REPO)


def main():
    from pyspark.sql import functions as F

    from druid_hadoop_utils_spark.operators import dedup as D
    from druid_hadoop_utils_spark.session import get_spark

    spark = get_spark("leak-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

    def persistent_count():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    print(f"repo={REPO} start persistent={persistent_count()}", flush=True)
    for i in range(N):
        batch = docs.where(F.col("doc_id") % 17 != i)  # distinct input per call
        out = D.minhash_lsh_dedup_pairs(batch, "doc_id", threshold=0.5)
        out.write.format("noop").mode("overwrite").save()
        del out
        gc.collect()
        spark._jvm.System.gc()
        time.sleep(2)  # let the ContextCleaner drain
        print(f"after call {i + 1}: persistent={persistent_count()}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
