"""Benchmark harness: runs the headline query battery at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "battery_total_sec", "value": N, "unit": "sec",
     "queries": {"q...": sec, ...}, "sf": ...}

Each query executes to completion through the noop sink (full execution,
no driver-side result serialization skew).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# the headline set: engine scan/filter/granularity/sketch paths, the
# relational HOST sweep, and the scale-path extension operators
HEADLINE = [
    "q_scan_interval_project",
    "q_filter_and_or_not",
    "q_granularity_hour_rollup",
    "q_granularity_fifteen_minute",
    "q_agg_hyperunique",
    "q_two_phase_hll",
    "q_agg_filtered",
    "q_tpch_q1_pricing_summary",
    "q_join_broadcast_dim",
    "q_join_5way_star",
    "q_window_topn_per_group",
    "q_set_ops",
    "q_dedup_exact",
    # the _prod entries run PRODUCTION LSH selectivity (bands=16; bits=8/
    # tables=16). The convergent oracle configs (q_dedup_minhash_lsh,
    # q_similarity_lsh_topk) deliberately degrade selectivity to make
    # recall provably 1.0 for the correctness gate — benching those
    # measured only the degenerate path (VERDICT r2), so the bench tracks
    # the real one.
    "q_dedup_minhash_lsh_prod",
    "q_dedup_simhash",
    "q_text_analysis",
    "q_similarity_topk",
    "q_similarity_lsh_topk_prod",
    "q_segment_table_load",
    "q_sessionize",
    "q_quantile_sketch",
    "q_tpch_q3_shipping_priority",
    # pre-trained persisted-index production config (nprobe=4/16); the
    # exhaustive-probe oracle config q_similarity_ivf_topk is
    # correctness-only (VERDICT r3 items 1-2)
    "q_similarity_ivf_topk_prod",
    "q_asof_join",
    "q_range_join",
    "q_rank_quantiles",
    "q_interval_overlap_join",
    "q_weighted_sample",
    "q_kll_quantiles",
    "q_similarity_pq_topk_prod",
    "q_mix_sources",
    "q_pack_documents",
    "q_theta_set_ops",
    "q_tpch_q21_suppliers_kept_waiting",
    "q_text_lm_score",
    "q_incremental_dedup",
    "q_leakage_safe_split",
    "q_bm25_search",
    "q_strip_dup_ngrams",
    "q_timeseries_smooth",
    "q_funnel",
    "q_cohort_retention",
    "q_timeseries_mad",
    "q_event_transitions",
    "q_hybrid_search",
]

# run each query twice and report the min: run-to-run variance on a busy
# box is ±30%, and the second run measures steady-state plan execution
# (the first pays Python-worker/codegen warmup)
REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))


def main() -> None:
    from druid_hadoop_utils_spark.battery import QUERIES
    from druid_hadoop_utils_spark.session import get_spark

    spark = get_spark("druid-hadoop-utils-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        best = None
        for _ in range(max(REPEATS, 1)):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "battery_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
