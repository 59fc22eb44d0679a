"""In-process alternating A/B for the round-16 dedup/text changes.

Loads the ROUND-15 dedup.py / text.py (from a worktree path given as
argv[1]) as separate modules inside the same session as HEAD's code and
times old/new alternately with bench.py's methodology (noop sink,
min-of-N). Same-process alternation is the only comparison this box
supports — its per-core throughput drifts up to 1.4x between sessions
on identical code (OPTIMIZATION_r15.md measurement notes), and round 16
confirmed the cause is hypervisor steal.

Usage: python tools/ab_probe_r16.py /root/wt_r15_base [repeats]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OLD = sys.argv[1] if len(sys.argv) > 1 else "/root/wt_r15_base"
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[name] = m
    spec.loader.exec_module(m)
    return m


def main() -> None:
    from pyspark.sql import functions as F

    from druid_hadoop_utils_spark.operators import dedup as new_dedup
    from druid_hadoop_utils_spark.operators import text as new_text
    from druid_hadoop_utils_spark.operators.sampling import hash_split
    from druid_hadoop_utils_spark.session import get_spark

    old_dedup = load(
        "old_dedup", f"{OLD}/druid_hadoop_utils_spark/operators/dedup.py")
    old_text = load(
        "old_text", f"{OLD}/druid_hadoop_utils_spark/operators/text.py")

    spark = get_spark("ab-probe-r16")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def simhash(D):
        return D.simhash_candidate_pairs(
            docs, "doc_id", max_hamming=3, bits=60, hash_mode="md5_60")

    def minhash_prod(D):
        return D.minhash_lsh_dedup_pairs(
            docs, "doc_id", threshold=0.5, num_hashes=64, bands=16
        ).withColumn("jaccard", F.round("jaccard", 4))

    def contamination(T):
        split = hash_split(docs.select("doc_id", "text"), "doc_id",
                           {"train": 0.9, "valid": 0.05, "test": 0.05})
        return T.contamination_pairs(split, min_shared=20, max_fp_docs=50)

    def neardup(D):
        seen = docs.where(F.col("doc_id") % 2 == 0)
        new = docs.where(F.col("doc_id") % 2 == 1)
        manifest = D.signature_manifest(seen, "doc_id")
        return D.incremental_neardup_pairs(
            new, manifest, "doc_id", threshold=0.5, verify_with=seen)

    cases = [
        ("simhash", simhash, old_dedup, new_dedup),
        ("minhash_prod", minhash_prod, old_dedup, new_dedup),
        ("neardup", neardup, old_dedup, new_dedup),
        ("contamination", contamination, old_text, new_text),
    ]

    # warm-up (both code paths once, untimed)
    for _, fn, old_m, new_m in cases:
        fn(old_m).write.format("noop").mode("overwrite").save()
        fn(new_m).write.format("noop").mode("overwrite").save()

    from druid_hadoop_utils_spark.operators.shared import release_shared

    out = {}
    for name, fn, old_m, new_m in cases:
        best = {"old": None, "new": None}
        for _ in range(REPEATS):
            for arm, mod in (("old", old_m), ("new", new_m)):
                # drop the new arm's ledgered caches before EITHER arm
                # runs: a lingering persisted plan would serve the old
                # arm's equal subtree from cache (measured: it made the
                # old arm read 4x faster than its true cost)
                release_shared()
                spark.sparkContext.setJobDescription(f"ab:{name}:{arm}")
                t0 = time.time()
                fn(mod).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                if best[arm] is None or dt < best[arm]:
                    best[arm] = dt
        out[name] = {
            "old_sec": round(best["old"], 3),
            "new_sec": round(best["new"], 3),
            "new_over_old": round(best["new"] / best["old"], 3),
        }
        print(f"# {name}: old={best['old']:.3f} new={best['new']:.3f} "
              f"ratio={best['new'] / best['old']:.3f}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
