"""Measure the materialize_shared size-gate crossover empirically
(VERDICT r16 item 6).

Builds replicated copies of the sf0.1 documents corpus at several parquet
sizes bracketing the 64 MiB default gate, then times the two gated text
operators (lm_score, bm25_topk) with the gate OFF (-1: subtree re-expands
per consumer) vs ON-unconditionally (0: always materialize), alternating
in one session (min-of-N) — the only comparison methodology this box
supports (hypervisor steal makes cross-session numbers drift up to 1.4x).

Replication keeps the text distribution identical, so the derived frames
stay model-sized (distinct bigrams / query-term postings) while the INPUT
— what the gate keys on — grows linearly: exactly the big-input/small-
derived shape the gate exists for.

Usage: python tools/gate_crossover_probe.py [sizes_mib ...] [--repeats N]
Writes the table to stdout as JSON; transcribe into plans/r16/.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = os.environ.get("SPARK_GRAFT_GATE_WORK", "/tmp/gate_crossover")


def main() -> None:
    from pyspark.sql import functions as F

    from druid_hadoop_utils_spark.operators.search import bm25_topk
    from druid_hadoop_utils_spark.operators.shared import (
        MIN_INPUT_BYTES_CONF,
        release_shared,
        shared_input_bytes,
    )
    from druid_hadoop_utils_spark.operators.text import lm_score
    from druid_hadoop_utils_spark.session import get_spark

    argv = sys.argv[1:]
    sizes_mib: list[int] = []
    repeats = 3
    i = 0
    while i < len(argv):
        if argv[i] == "--repeats":
            repeats = int(argv[i + 1]); i += 2; continue
        if argv[i].startswith("--repeats="):
            repeats = int(argv[i].split("=", 1)[1])
        else:
            sizes_mib.append(int(argv[i]))
        i += 1
    if not sizes_mib:
        # nominal UNCOMPRESSED text MiB; replicated text parquet-compresses
        # ~11.6x on disk, and the gate keys on the on-disk (Catalyst leaf)
        # estimate, so these bracket the 64 MiB default gate at
        # est ≈ 0.7 / 5.5 / 22 / 66 / 132 MiB
        sizes_mib = [8, 64, 256, 768, 1536]

    spark = get_spark("gate-crossover")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text")
    base_bytes = os.path.getsize(f"{SF_DIR}/documents.parquet")

    os.makedirs(WORK, exist_ok=True)
    paths: dict[int, str] = {}
    for mib in sizes_mib:
        path = f"{WORK}/documents_{mib}mib.parquet"
        if not os.path.exists(path):
            reps = max(1, round(mib * 1024 * 1024 / base_bytes))
            # 32-way layout so the scan parallelizes like a real corpus
            # (a single output file made every downstream stage 1-task)
            (base.crossJoin(
                spark.range(reps).select(F.col("id").alias("__rep")))
             .select(
                 (F.col("doc_id") + F.col("__rep") * F.lit(10_000_000)
                  ).alias("doc_id"),
                 "text")
             .repartition(32)
             .write.mode("overwrite").parquet(path))
        paths[mib] = path

    query = ["data", "spark", "segment", "query", "the"]
    cases = {
        "lm_score": lambda d: lm_score(d),
        "bm25": lambda d: bm25_topk(d, query, k=10),
    }

    # warm-up
    warm = spark.read.parquet(paths[sizes_mib[0]])
    for fn in cases.values():
        fn(warm).write.format("noop").mode("overwrite").save()

    out: dict[str, dict] = {}
    for mib in sizes_mib:
        docs = spark.read.parquet(paths[mib])
        est = shared_input_bytes(docs)
        row: dict[str, dict] = {"input_bytes_est": est}
        for cname, fn in cases.items():
            best = {"inline": None, "materialized": None}
            for _ in range(repeats):
                for arm, conf in (("inline", "-1"), ("materialized", "0")):
                    release_shared()
                    spark.conf.set(MIN_INPUT_BYTES_CONF, conf)
                    spark.sparkContext.setJobDescription(
                        f"gate:{cname}:{mib}mib:{arm}")
                    t0 = time.time()
                    fn(docs).write.format("noop").mode("overwrite").save()
                    dt = time.time() - t0
                    if best[arm] is None or dt < best[arm]:
                        best[arm] = dt
            spark.conf.unset(MIN_INPUT_BYTES_CONF)
            release_shared()
            row[cname] = {
                "inline_sec": round(best["inline"], 3),
                "materialized_sec": round(best["materialized"], 3),
                "mat_over_inline": round(
                    best["materialized"] / best["inline"], 3),
            }
            print(f"# {mib} MiB {cname}: inline={best['inline']:.3f} "
                  f"mat={best['materialized']:.3f}", file=sys.stderr)
        out[f"{mib}MiB"] = row
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
