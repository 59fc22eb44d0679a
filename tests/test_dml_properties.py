"""Randomized DML soundness sweep: merge_into / delete_where against a
pure-Python reference over arbitrary small tables.

The reference computes expected final state with plain dict/set logic
(bucket-scoped key replacement; predicate filtering) — no Spark, no
engine code — so agreement across random seeds pins the SEMANTICS, not
a fixture. One Spark table per seed batch, several mutations composed
per case (merge then delete then merge-delete) to catch interaction
bugs the single-op tests can't.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import Row

from druid_hadoop_utils_spark import load
from druid_hadoop_utils_spark.sources.dml import delete_where, merge_into
from druid_hadoop_utils_spark.sources.ingest import publish_segments

SPEC = {"granularity": "NONE", "dimensions": ["k", "cat"],
        "metrics": [{"name": "v", "type": "double"}]}
T0 = datetime(2024, 3, 1)


def _bucket(ts: datetime) -> datetime:
    return ts.replace(hour=0, minute=0, second=0, microsecond=0)


def _expected_after_merge(state: dict, updates: list[Row], matched: str):
    """state: {(bucket, k): list[(ts, k, cat, v)]}. Bucket-scoped key
    replacement: matched base rows drop; update-mode inserts the update
    rows."""
    out = {bk: [r for r in rows] for bk, rows in state.items()}
    upd_keys = {(_bucket(u.ts), u.k) for u in updates}
    for bk in list(out):
        out[bk] = [r for r in out[bk] if (bk[0], r[1]) not in
                   {(b, k) for (b, k) in upd_keys if b == bk[0]}]
    if matched == "update":
        for u in updates:
            out.setdefault((_bucket(u.ts), u.k), [])
        # rows group by (bucket, k) for comparison convenience below;
        # store under their own key
        for u in updates:
            out[(_bucket(u.ts), u.k)].append((u.ts, u.k, u.cat, u.v))
    return out


def _flatten(state: dict):
    return sorted(r for rows in state.values() for r in rows)


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_randomized_merge_delete_against_reference(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / f"t{seed}")

    # random base: 3-5 days x 2-6 rows/day, keys k0..k4, cats a/b
    base_rows = []
    days = rng.randint(3, 5)
    for d in range(days):
        for _ in range(rng.randint(2, 6)):
            ts = T0 + timedelta(days=d, hours=rng.randint(0, 23),
                                minutes=rng.randint(0, 59))
            base_rows.append((ts, f"k{rng.randint(0, 4)}",
                              rng.choice("ab"), float(rng.randint(0, 99))))
    # unique (bucket, key): the merge contract replaces ALL rows of a
    # matched key in the bucket — keep the reference simple by making
    # (bucket, key) unique in the base (duplicates are exercised in
    # test_dml.py's fixed cases)
    seen, uniq = set(), []
    for r in base_rows:
        bk = (_bucket(r[0]), r[1])
        if bk not in seen:
            seen.add(bk)
            uniq.append(r)
    base_rows = uniq
    publish_segments(
        spark.createDataFrame([Row(ts=t, k=k, cat=c, v=v)
                               for t, k, c, v in base_rows]),
        root, "t", version="v1", time_column="ts", bucket="DAY")

    state: dict = {}
    for t, k, c, v in base_rows:
        state.setdefault((_bucket(t), k), []).append((t, k, c, v))

    # --- mutation 1: merge update (some matched, some inserts)
    updates = []
    for _ in range(rng.randint(1, 4)):
        d = rng.randint(0, days)  # may open a NEW day
        ts = T0 + timedelta(days=d, hours=rng.randint(0, 23))
        updates.append(Row(ts=ts, k=f"k{rng.randint(0, 5)}",  # k5 = insert
                           cat="u", v=float(rng.randint(100, 199))))
    merge_into(spark, root, "t",
               spark.createDataFrame(updates).withColumnRenamed(
                   "ts", "__time"), ["k"])
    state = _expected_after_merge(state, updates, "update")

    # --- mutation 2: delete_where cat = 'a'
    delete_where(spark, root, "t",
                 {"type": "selector", "dimension": "cat", "value": "a"})
    state = {bk: [r for r in rows if r[2] != "a"]
             for bk, rows in state.items()}

    # --- mutation 3: merge delete of one random existing key
    all_rows = _flatten(state)
    if all_rows:
        victim = rng.choice(all_rows)
        merge_into(spark, root, "t", spark.createDataFrame(
            [Row(__time=victim[0], k=victim[1])]), ["k"],
            when_matched="delete")
        vb = _bucket(victim[0])
        state = {bk: [r for r in rows
                      if not (bk[0] == vb and r[1] == victim[1])]
                 for bk, rows in state.items()}

    got = sorted(
        (r["__time"], r["k"], r["cat"], r["v"])
        for r in load(spark, root, SPEC, interval="2024-03-01/2024-04-01",
                      data_source="t").collect())
    assert got == _flatten(state), f"seed {seed}"
