"""In-process alternating A/B for the round-16 similarity/KLL changes
(norm pre-computation, fused IVF-PQ assign+encode, applyInArrow state
merge).

Loads the PRE-CHANGE similarity.py / kll.py snapshots (argv[1] = a
directory holding old_similarity_r16.py and old_kll_r16.py, shipped to
workers via addPyFile so their pandas UDFs unpickle) inside the same
session as HEAD's code and times old/new alternately with bench.py's
methodology (noop sink, min-of-N). Same-process alternation is the only
comparison this box supports — hypervisor steal drifts per-core
throughput up to 1.4x between sessions on identical code
(OPTIMIZATION_r16.md, ground-truth section).

Usage: python tools/ab_probe_r16b.py [snapshot_dir] [repeats]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAP = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from druid_hadoop_utils_spark.functions import kll as new_kll
    from druid_hadoop_utils_spark.operators import similarity as new_sim
    from druid_hadoop_utils_spark.session import get_spark

    spark = get_spark("ab-probe-r16b")
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addPyFile(f"{SNAP}/old_similarity_r16.py")
    spark.sparkContext.addPyFile(f"{SNAP}/old_kll_r16.py")
    sys.path.insert(0, SNAP)
    import old_kll_r16 as old_kll
    import old_similarity_r16 as old_sim

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "__day", F.to_date("ts"))
    qs = emb.where(F.col("vec_id") < 5)

    # one shared pre-trained index (identical for both arms — training is
    # driver-side numpy, untouched this round)
    idx = new_sim.train_ann_index(emb, n_cells=16, m=8, ks=16)

    def brute(M):
        return M.brute_force_topk(emb, qs, k=5).withColumn(
            "cos_sim", F.round("cos_sim", 4))

    def lsh_prod(M):
        return M.lsh_topk(emb, qs, k=5, bits=8, tables=16).withColumn(
            "cos_sim", F.round("cos_sim", 4))

    def ivf_prod(M):
        return M.ivf_topk(emb, qs, k=5, nprobe=4, index=idx).withColumn(
            "cos_sim", F.round("cos_sim", 4))

    def pq_prod(M):
        return M.ivfpq_topk(emb, qs, k=5, nprobe=4, index=idx).withColumn(
            "cos_sim", F.round("cos_sim", 4))

    def kll_reagg(M):
        daily = M.kll_state_grouped(ev, "value", ["event_type", "__day"],
                                    k=256)
        merged = M.merge_kll_states(daily.drop("__day"), ["event_type"])
        return M.kll_quantiles(merged, ["event_type"], [0.25, 0.5, 0.95])

    cases = [
        ("similarity_topk", brute, old_sim, new_sim),
        ("lsh_topk_prod", lsh_prod, old_sim, new_sim),
        ("ivf_topk_prod", ivf_prod, old_sim, new_sim),
        ("pq_topk_prod", pq_prod, old_sim, new_sim),
        ("kll_state_reagg", kll_reagg, old_kll, new_kll),
    ]

    for _, fn, old_m, new_m in cases:
        fn(old_m).write.format("noop").mode("overwrite").save()
        fn(new_m).write.format("noop").mode("overwrite").save()

    out = {}
    for name, fn, old_m, new_m in cases:
        best = {"old": None, "new": None}
        for _ in range(REPEATS):
            for arm, mod in (("old", old_m), ("new", new_m)):
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
