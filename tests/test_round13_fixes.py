"""Round-13 regression pins for the ADVICE r12 findings.

1. (medium) ``compact_postings`` derived the tree's NAME (timeline
   version) and its CONTENTS (visible state paths) from two separate
   manifest listings — a publish landing between them named the tree
   with the NEW version while its contents reflected the OLD visible
   set, so readers treated an incomplete tree as current and silently
   dropped the new segment's postings. Both now derive from ONE
   listing snapshot: a racing publish can only make the tree
   stale-NAMED, and readers fall back to the always-correct
   per-segment union.

2. (low) the caught-up empty-feed schema probe in ``read_changes``
   picked the newest manifest by RAW STRING comparison of
   ``published_at`` — mixed stamp formats ('Z' vs '+02:00' offsets,
   differing sub-second precision) could select an actually-older
   segment and, under the evolve-forward convention, miss newly added
   columns. It now parses stamps with ``_parse_as_of``, same as
   ``latest_stamp`` / ``consumer_lag``.

3. (low) ``publish_ann_index`` stamped ``trained_as_of`` AFTER
   resolving/training on the view: a publish landing mid-train was
   excluded from the trained corpus yet sat at-or-below the anchor, so
   the drift check (``read_changes`` FROM the anchor) never counted
   those rows — drift undercounted forever for that artifact. The
   anchor is now captured BEFORE the view resolves, so mid-train
   publishes land ABOVE it and count as drift (conservative).

4. (low) stale compact-postings trees are vacuumed under the same
   mtime age floor as tmp dirs (in-flight lazy readers get grace) —
   pinned in test_operators_similarity.py::test_compact_postings.

5. (nit) ``ivf_topk_from_postings`` computed the query-side cell-assign
   Arrow pass twice (once for the probed-cell collect, once in the
   broadcast join); the query frame is now persisted so it runs once.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators import similarity as S
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.segments import (
    _parse_as_of,
    timeline_version,
    timeline_version_of,
)
from druid_hadoop_utils_spark.sources.tables import load_table

SPEC = {"granularity": "NONE", "dimensions": ["vec_id"],
        "metrics": [{"name": "embedding", "type": "complex"}]}


def _emb_two_days(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").withColumn(
        "ts", F.when(F.col("vec_id") % 2 == 0,
                     F.lit("2024-01-01 00:00:00"))
              .otherwise(F.lit("2024-01-02 00:00:00"))
              .cast("timestamp"))


# ---------------------------------------------------------------------
# 1. compact_postings: one snapshot names AND fills the tree
# ---------------------------------------------------------------------


def test_compact_postings_single_snapshot_under_racing_publish(
        spark, sf_dir, tmp_path, monkeypatch):
    """A publish landing immediately after compact_postings' manifest
    snapshot must leave the tree STALE-named (readers fall back to the
    union and see the new segment's missing state), never current-but-
    incomplete (readers silently dropping the new postings)."""
    from druid_hadoop_utils_spark.sources import segments as seg_mod
    from druid_hadoop_utils_spark.sources.materialize import (
        compact_postings,
        materialize_postings,
        read_postings,
    )

    root = str(tmp_path)
    emb = _emb_two_days(spark, sf_dir)
    publish_segments(emb.where(F.col("vec_id") % 2 == 0), root, "emb",
                     version="v1", time_column="ts", bucket="DAY")
    S.publish_ann_index(spark, root, "emb", spec=SPEC, n_cells=8,
                        sample=512)
    materialize_postings(spark, root, "emb", "ivf")

    day2 = emb.where(F.col("vec_id") % 2 == 1)
    real = seg_mod.list_manifests
    state = {"raced": False, "snapshot": None}

    def racing(table_root, data_source, **kw):
        out = real(table_root, data_source, **kw)
        if not state["raced"]:
            # the publish lands the instant after the FIRST listing —
            # the worst-case interleave for a two-listing TOCTOU
            state["raced"] = True
            state["snapshot"] = out
            publish_segments(day2, root, "emb", version="v2",
                             time_column="ts", bucket="DAY")
        return out

    monkeypatch.setattr(seg_mod, "list_manifests", racing)
    path = compact_postings(spark, root, "emb", "ivf")
    monkeypatch.undo()

    token = os.path.basename(path)[len("_compact."):-len(".parquet")]
    # named by ITS OWN snapshot — which the racing publish made stale
    assert token == timeline_version_of(state["snapshot"])
    assert token != timeline_version(root, "emb")
    # so the reader does NOT serve the incomplete tree: it unions the
    # per-segment states and refuses on the new segment's missing one
    with pytest.raises(FileNotFoundError, match="no state"):
        read_postings(spark, root, "emb", "ivf")
    # catch-up restores a correct, complete union read
    materialize_postings(spark, root, "emb", "ivf")
    post = read_postings(spark, root, "emb", "ivf")
    assert not any("_compact." in f for f in post.inputFiles())
    assert post.count() == emb.count()


# ---------------------------------------------------------------------
# 3. publish_ann_index: trained_as_of lower-bounds the trained view
# ---------------------------------------------------------------------


def test_trained_as_of_lower_bounds_training_view(
        spark, sf_dir, tmp_path, monkeypatch):
    """A publish landing between view resolution and the anchor stamp
    must land ABOVE trained_as_of (counted as drift), not at-or-below
    it (invisible to the drift check forever)."""
    from druid_hadoop_utils_spark.plans import planner as planner_mod

    root = str(tmp_path)
    emb = _emb_two_days(spark, sf_dir)
    publish_segments(emb.where(F.col("vec_id") % 2 == 0), root, "emb",
                     version="v1", time_column="ts", bucket="DAY")

    day2 = emb.where(F.col("vec_id") % 2 == 1)
    real_load = planner_mod.load
    state = {"raced": False}

    def racing_load(*a, **kw):
        df = real_load(*a, **kw)
        if not state["raced"]:
            state["raced"] = True
            # mid-train publish: resolved AFTER the training view, so
            # its rows are NOT in the trained corpus
            publish_segments(day2, root, "emb", version="v2",
                             time_column="ts", bucket="DAY")
        return df

    monkeypatch.setattr(planner_mod, "load", racing_load)
    S.publish_ann_index(spark, root, "emb", spec=SPEC, n_cells=4,
                        sample=256)
    monkeypatch.undo()

    idx = S.load_ann_index(S.ann_index_path(root, "emb"))
    from druid_hadoop_utils_spark.sources.changes import latest_stamp

    # the mid-train publish's stamp sits strictly ABOVE the anchor:
    # read_changes(from=trained_as_of) counts those untrained rows
    assert (_parse_as_of(idx["trained_as_of"])
            < _parse_as_of(latest_stamp(root, "emb")))


# ---------------------------------------------------------------------
# 5. ivf_topk_from_postings runs the query-side assign pass once
# ---------------------------------------------------------------------


def test_ivf_postings_query_side_local(spark, sf_dir, tmp_path):
    from druid_hadoop_utils_spark.plans.planner import load as eng_load
    from druid_hadoop_utils_spark.sources.materialize import (
        materialize_postings,
        read_postings,
    )

    root = str(tmp_path)
    emb = _emb_two_days(spark, sf_dir)
    publish_segments(emb, root, "emb", version="v1", time_column="ts",
                     bucket="DAY")
    S.publish_ann_index(spark, root, "emb", spec=SPEC, n_cells=8,
                        sample=512)
    idx = S.load_published_ann_index(root, "emb")
    materialize_postings(spark, root, "emb", "ivf")
    post = read_postings(spark, root, "emb", "ivf")

    corpus = eng_load(spark, root, SPEC,
                      interval="1970-01-01/3000-01-01",
                      data_source="emb")
    cached_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    res = S.ivf_topk_from_postings(post, corpus.where(F.col("vec_id") < 4),
                                   k=3, nprobe=2, index=idx)
    # the broadcast-join branch reads a LOCAL frame (collect-and-
    # recreate, round 14): the assign UDF's Arrow pass ran exactly
    # once, during the probed-cell collect, so NO Python eval node
    # remains in the executed plan — and nothing stays cached behind
    # the caller's back after the call returns
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert res.count() > 0
    assert (spark.sparkContext._jsc.getPersistentRDDs().size()
            == cached_before)
