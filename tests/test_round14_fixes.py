"""Round-14 fixes (ADVICE r13 + VERDICT r13 item 4), each pinned.

1. ``maintain_table``: a failing consumer-floor step SKIPS vacuum for
   the cycle instead of running it UNFLOORED (ADVICE medium — the old
   ``_step`` wrapper turned a floor exception into ``floor_as_of=None``,
   destructively reclaiming views a lagging consumer still needs).
2. ``consumers_floor_as_of`` raises on an unreadable registered
   checkpoint (its instant is unknown — skipping it would move the
   floor in the destructive direction); ``list_consumers`` contains the
   same failure per entry instead of propagating (ADVICE low #3).
3. ``list_consumers`` skips entries violating the registry name rules
   (``_``-prefixed or otherwise invalid stems can't pin the floor).
4. ``list_consumers`` overlaps checkpoint reads on the filesystem bulk
   pool (VERDICT r13 item 4): wall-clock and request counts asserted on
   the latency-injecting DelayFS.
5. Pointer backends: stale ``_compact.*`` postings trees age-gate on
   the RESOLVED token dir, not the never-existing logical
   ``<stem>.parquet`` name — so they actually reclaim once past the
   floor instead of leaking forever (ADVICE low #2).

(ADVICE low #4 — the ivf_topk_from_postings persist leak — is pinned in
test_round13_fixes.py::test_ivf_postings_query_side_local, updated to
the collect-and-recreate contract.)
"""

from __future__ import annotations

import time
from datetime import datetime

import pytest
from pyspark.sql import Row, functions as F

from druid_hadoop_utils_spark.sources.changes import (
    commit_consumed,
    consume_changes,
    consumer_checkpoint_path,
    consumers_floor_as_of,
    list_consumers,
    read_changes,
)
from druid_hadoop_utils_spark.sources.dml import delete_where
from druid_hadoop_utils_spark.sources.fs import get_fs
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.maintenance import maintain_table
from druid_hadoop_utils_spark.sources.tables import load_table

T1 = "2024-06-01T00:00:00+00:00"


def _base(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        F.col("ts").alias("__time"), "event_id", "event_type", "value",
        "user_id")


# ---------------------------------------------------------------------
# 1 + 2. floor failure => vacuum SKIPPED, never unfloored
# ---------------------------------------------------------------------


def test_maintain_table_skips_vacuum_on_floor_failure(
        spark, sf_dir, tmp_path):
    """End-to-end through the real failure path: a corrupt REGISTERED
    checkpoint makes consumers_floor_as_of raise, and maintain_table
    must react by NOT vacuuming (the lagging consumer's diff-FROM view
    survives), not by vacuuming unfloored."""
    root = str(tmp_path)
    base = _base(spark, sf_dir)
    publish_segments(base, root, "events", version="v1", bucket="DAY",
                     published_at=T1)

    # a real lagging consumer, checkpointed at T1
    ckpt = consumer_checkpoint_path(root, "events", "featgen")
    _, tok = consume_changes(spark, root, "events", ckpt)
    commit_consumed(ckpt, tok)
    assert tok == T1

    # DML creates overshadowed history the consumer still needs
    delete_where(spark, root, "events",
                 {"type": "selector", "dimension": "event_type",
                  "value": "error"})
    n_err = base.where(F.col("event_type") == "error").count()
    assert n_err > 0

    # a SECOND registered checkpoint, corrupt on disk
    bad = consumer_checkpoint_path(root, "events", "broken")
    fs = get_fs(root)
    fs.mkdirs(fs.parent(bad))
    fs.put_text(bad, "{not json")

    with pytest.raises(RuntimeError, match="broken"):
        consumers_floor_as_of(root, "events")

    rep = maintain_table(spark, root, "events", strict=False)
    assert rep["vacuumed"] == []
    assert rep["consumer_floor_as_of"] is None
    assert any("consumers_floor_as_of" in e for e in rep["errors"])
    assert any("vacuum: skipped" in e for e in rep["errors"])
    # the lagging consumer's view is intact: the feed from T1 resolves
    feed = read_changes(spark, root, "events", tok)
    assert feed.count() == n_err

    # strict mode surfaces the same failure loudly
    with pytest.raises(RuntimeError, match="vacuum: skipped"):
        maintain_table(spark, root, "events")

    # repairing the checkpoint restores normal floored maintenance
    commit_consumed(bad, tok)
    commit_consumed(ckpt,
                    consume_changes(spark, root, "events", ckpt)[1])
    rep2 = maintain_table(spark, root, "events", strict=False)
    assert rep2["errors"] == []
    assert rep2["consumer_floor_as_of"] == tok  # slowest = 'broken' @ T1


# ---------------------------------------------------------------------
# 2 + 3. list_consumers: error containment + name-rule enforcement
# ---------------------------------------------------------------------


def test_list_consumers_contains_errors_and_skips_invalid_names(
        spark, sf_dir, tmp_path):
    root = str(tmp_path)
    publish_segments(_base(spark, sf_dir), root, "events", version="v1",
                     bucket="DAY", published_at=T1)
    good = consumer_checkpoint_path(root, "events", "good")
    commit_consumed(good, T1)

    fs = get_fs(root)
    cdir = fs.join(root, "events", "_consumers")
    # stray files violating the registry name rules: SKIPPED entirely
    fs.put_text(fs.join(cdir, "_editor_backup.json"), "junk")
    # a validly-named but corrupt checkpoint: reported, not propagated
    fs.put_text(fs.join(cdir, "corrupt.json"), "{not json")
    # a parseable JSON whose asOf value is garbage: reported too
    fs.put_text(fs.join(cdir, "badstamp.json"),
                '{"asOf": "not-a-stamp", "committedAt": "x"}')

    lags = list_consumers(root, "events")
    assert set(lags) == {"good", "corrupt", "badstamp"}
    assert lags["good"]["consumed_as_of"] == T1
    assert "error" in lags["corrupt"]
    assert lags["corrupt"]["behind_s"] is None
    assert "error" in lags["badstamp"]
    assert "not-a-stamp" in lags["badstamp"]["error"]

    # the floor refuses while ANY registered checkpoint is unreadable —
    # and names the culprits
    with pytest.raises(RuntimeError) as ei:
        consumers_floor_as_of(root, "events")
    assert "corrupt" in str(ei.value) and "badstamp" in str(ei.value)

    # repair both: floor returns (the oldest committed stamp)
    commit_consumed(fs.join(cdir, "corrupt.json"), T1)
    commit_consumed(fs.join(cdir, "badstamp.json"), T1)
    assert consumers_floor_as_of(root, "events") == T1


# ---------------------------------------------------------------------
# 4. pooled checkpoint reads (VERDICT r13 item 4)
# ---------------------------------------------------------------------


def test_list_consumers_overlaps_checkpoint_reads(
        spark, tmp_path, monkeypatch):
    """At hundreds of registered consumers on an object store the old
    sequential loop was one RTT per checkpoint inside every
    maintain_table cycle. Measured on DelayFS: 16 consumers at 20 ms
    injected RTT must read well under the ~16 x 2 x 20 ms = 640 ms
    sequential cost (reads overlap on fs.bulk_parallelism = 16)."""
    from druid_hadoop_utils_spark.sources import fs as fsmod

    # build the table and register consumers with delay OFF
    monkeypatch.setenv("SPARK_GRAFT_DELAY_MS", "0")
    fsmod._CACHE.pop("delaysim", None)
    root = "delaysim://" + str(tmp_path / "tbl")
    rows = [Row(ts=datetime(2024, 1, 1, h), k=f"k{h}", v=float(h))
            for h in range(4)]
    publish_segments(spark.createDataFrame(rows), root, "t",
                     version="v1", time_column="ts", bucket="DAY",
                     published_at=T1)
    names = [f"consumer{i:02d}" for i in range(16)]
    for n in names:
        commit_consumed(consumer_checkpoint_path(root, "t", n), T1)

    # re-resolve the scheme with a 20 ms injected RTT
    monkeypatch.setenv("SPARK_GRAFT_DELAY_MS", "20")
    fsmod._CACHE.pop("delaysim", None)
    fs = get_fs(root)
    fs.reset_counts()
    t0 = time.time()
    lags = list_consumers(root, "t")
    wall = time.time() - t0
    fsmod._CACHE.pop("delaysim", None)  # don't leak 20 ms to later tests

    assert set(lags) == set(names)
    assert all(lag["consumed_as_of"] == T1 for lag in lags.values())
    # one existence probe + one read per checkpoint actually happened
    assert fs.op_counts.get("read_text", 0) >= len(names)
    # Parallelism proof RELATIVE to the measured serial floor, not a
    # fixed wall constant (ADVICE r14: a fixed 0.40 s could flake on a
    # loaded box). Every counted round-trip sleeps delay_s, so a
    # sequential loop CANNOT finish faster than total_rts * delay_s;
    # the pooled pass must beat that floor with 25% headroom — at 16
    # consumers the floor is >= 0.68 s while ideal pooled is ~0.1 s,
    # so the margin absorbs scheduler noise in both directions.
    total_rts = sum(fs.op_counts.values())
    assert total_rts >= 2 * len(names), fs.op_counts
    serial_floor = total_rts * fs.delay_s
    assert wall < 0.75 * serial_floor, (wall, serial_floor, fs.op_counts)


# ---------------------------------------------------------------------
# 5. pointer backends: stale compact postings trees actually reclaim
# ---------------------------------------------------------------------


def test_pointer_backend_stale_compact_tree_reclaims(
        spark, sf_dir, tmp_path):
    """ADVICE r13 low #2: on pointer backends _stale probed the logical
    '<stem>.parquet' path, which never exists (pointer = PTR_SUFFIX,
    data = '.parquet.<token>'), so prefix_age_s yielded None and stale
    _compact.* trees leaked FOREVER — vacuum_materialized(tmp_min_age_s
    =0) was a no-op for them. The gate now probes the resolved token
    dir: default floor still protects in-flight readers, floor 0
    reclaims."""
    from druid_hadoop_utils_spark.operators import similarity as S
    from druid_hadoop_utils_spark.sources.materialize import (
        compact_postings,
        materialize_postings,
        read_postings,
        vacuum_materialized,
    )

    root = "objectsim://" + str(tmp_path / "tbl")
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "ts", F.when(F.col("vec_id") % 2 == 0,
                     F.lit("2024-01-01 00:00:00"))
              .otherwise(F.lit("2024-01-02 00:00:00"))
              .cast("timestamp"))
    publish_segments(emb, root, "emb", version="v1", time_column="ts",
                     bucket="DAY")
    spec = {"granularity": "NONE", "dimensions": ["vec_id"],
            "metrics": [{"name": "embedding", "type": "complex"}]}
    S.publish_ann_index(spark, root, "emb", spec=spec, n_cells=8,
                        sample=512)
    materialize_postings(spark, root, "emb", "ivf")
    path = compact_postings(spark, root, "emb", "ivf")
    assert "_compact." in path
    fs = get_fs(root)
    assert not fs.atomic_dir_rename  # this IS the pointer backend

    # DML flips the timeline version -> the tree is stale by NAME
    delete_where(spark, root, "emb",
                 {"type": "selector", "dimension": "vec_id",
                  "value": "2"})
    materialize_postings(spark, root, "emb", "ivf")
    path2 = compact_postings(spark, root, "emb", "ivf")
    assert path2 != path
    stale_stem = fs.name(path)[:-len(".parquet")]

    # default 6 h floor: the stale tree gets in-flight-reader grace
    kept = vacuum_materialized(root, "emb", "ivf")
    assert stale_stem not in kept
    # floor 0: reclaimed — this was the leak (pre-fix: never reclaimed)
    reclaimed = vacuum_materialized(root, "emb", "ivf", tmp_min_age_s=0)
    assert stale_stem in reclaimed
    # pointer AND token dir are both gone; the current tree serves
    assert not fs.exists(path + ".ptr.json")
    served = read_postings(spark, root, "emb", "ivf")
    assert all("_compact." in f for f in served.inputFiles())
    assert served.count() == emb.count() - 1
    # idempotent second sweep: nothing further to reclaim
    assert vacuum_materialized(root, "emb", "ivf", tmp_min_age_s=0) == []


# ---------------------------------------------------------------------
# 6. the consumer-lag gauge in table_stats
# ---------------------------------------------------------------------


def test_table_stats_consumer_gauge(spark, sf_dir, tmp_path):
    from druid_hadoop_utils_spark.sources.maintenance import table_stats

    root = str(tmp_path)
    base = _base(spark, sf_dir)
    publish_segments(base, root, "events", version="v1", bucket="DAY",
                     published_at=T1)
    # no registered consumers: empty gauge
    g = table_stats(root, "events")["consumers"]
    assert g == {"registered": 0, "slowest": None, "max_behind_s": None,
                 "errors": []}

    caught = consumer_checkpoint_path(root, "events", "caught")
    commit_consumed(caught, T1)
    fs = get_fs(root)
    fs.put_text(fs.join(fs.parent(caught), "corrupt.json"), "{nope")

    g = table_stats(root, "events")["consumers"]
    assert g["registered"] == 2
    assert g["errors"] == ["corrupt"]
    assert g["slowest"] == "caught" and g["max_behind_s"] == 0.0

    # a later publish makes the committed consumer LAG
    fs.delete_file(fs.join(fs.parent(caught), "corrupt.json"))
    publish_segments(base.limit(5), root, "events", version="v2",
                     bucket="DAY",
                     published_at="2024-06-02T00:00:00+00:00")
    g = table_stats(root, "events")["consumers"]
    assert g == {"registered": 1, "slowest": "caught",
                 "max_behind_s": 86400.0, "errors": []}


def test_list_consumers_dict_valued_asof_contained(spark, sf_dir,
                                                   tmp_path):
    """A checkpoint whose asOf VALUE is a JSON object (not a stamp
    string) must land in the unparseable-stamp branch — it must not
    collide with the internal read-error sentinel or escape as a
    KeyError."""
    root = str(tmp_path)
    publish_segments(_base(spark, sf_dir), root, "events", version="v1",
                     bucket="DAY", published_at=T1)
    good = consumer_checkpoint_path(root, "events", "good")
    commit_consumed(good, T1)
    fs = get_fs(root)
    fs.put_text(fs.join(fs.parent(good), "weird.json"),
                '{"asOf": {"nested": 1}, "committedAt": "x"}')
    lags = list_consumers(root, "events")
    assert set(lags) == {"good", "weird"}
    assert "error" in lags["weird"]
    assert lags["good"]["consumed_as_of"] == T1
    with pytest.raises(RuntimeError, match="weird"):
        consumers_floor_as_of(root, "events")
