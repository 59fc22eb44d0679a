"""The composed operator path (VERDICT r7 item 6): tag → compact →
more publishes → restore-to-tag → materialize catch-up → query — the
sequence a real table operator hits across a quarter, in one test, on
both the POSIX and the no-rename object-store backends.

publish 100 DAY segments → create_tag → compact_manifests (snapshot)
→ publish an overshadowing correction wave → restore_to the tag
(metadata-only) → materialize_aggs catch-up (computes ONLY the states
the restore's re-announced manifests are missing) → query_materialized
equals both the as_of=tag read and the raw post-restore read.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

pytestmark = pytest.mark.slow  # heavy stress/e2e sweep; excluded from the default (driver-verify) run
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark import load
from druid_hadoop_utils_spark.sources.ingest import publish_segments
from druid_hadoop_utils_spark.sources.maintenance import restore_to
from druid_hadoop_utils_spark.sources.materialize import (
    materialize_aggs,
    query_materialized,
)
from druid_hadoop_utils_spark.sources.segments import (
    compact_manifests,
    create_tag,
    list_manifests,
)


@pytest.fixture(params=["local", "objectsim"])
def root(tmp_path, request):
    if request.param == "local":
        return str(tmp_path / "tbl")
    return "objectsim://" + str(tmp_path / "tbl")


def _wave(spark, days: int, start_day: int = 0, value_base: float = 1.0):
    """3 rows/day over ``days`` days from 2024-01-01+start_day."""
    t0 = datetime(2024, 1, 1)
    rows = [
        Row(ts=t0 + timedelta(days=start_day + d, hours=h),
            event_type=f"e{h}", value=value_base * (d + 1))
        for d in range(days) for h in (0, 8, 16)
    ]
    return spark.createDataFrame(rows)


_SPEC = {"granularity": "NONE", "dimensions": ["event_type"],
         "metrics": [{"name": "value", "type": "doubleSum"}]}


def _agg_rows(df):
    return {
        (r["event_type"], round(r["s"], 6))
        for r in df.groupBy("event_type").agg(F.sum("value").alias("s"))
        .collect()
    }


def test_tag_compact_restore_materialize_catchup(spark, root):
    # 1. the good state: 100 DAY segments in one distributed publish
    publish_segments(_wave(spark, 100), root, "ev", version="v1",
                     time_column="ts", bucket="DAY")
    good = _agg_rows(load(spark, root, _SPEC,
                          interval="2024-01-01/2024-06-01",
                          data_source="ev"))
    tag = create_tag(root, "ev", "quarter-close")

    # 2. compaction folds 100 manifest files into ONE snapshot; the
    # tagged view must survive the fold
    assert compact_manifests(root, "ev") is not None
    assert len(list_manifests(root, "ev")) == 100

    # 3. a correction wave overshadows the first 15 days (v2 > v1) —
    # the current view now differs from the tag
    publish_segments(_wave(spark, 15, start_day=0, value_base=100.0),
                     root, "ev", version="v2", time_column="ts",
                     bucket="DAY")
    cur = _agg_rows(load(spark, root, _SPEC,
                         interval="2024-01-01/2024-06-01",
                         data_source="ev"))
    assert cur != good
    # the tag still answers the good view through the snapshot+wave mix
    tagged = _agg_rows(load(spark, root, _SPEC,
                            interval="2024-01-01/2024-06-01",
                            data_source="ev", as_of="tag:quarter-close"))
    assert tagged == good

    # 4. materialize the CURRENT (bad) view first — the restore must
    # then leave these states stale-but-unused, not corrupt the answer
    n_first = len(materialize_aggs(
        spark, root, "ev", "daily", dimensions=["event_type"],
        aggregations=[{"name": "value_sum", "type": "doubleSum",
                       "fieldName": "value"}]))
    assert n_first == 100  # 85 surviving v1 days + 15 v2 days

    # 5. restore: metadata-only flip back to the tagged view
    announced = restore_to(root, "ev", f"tag:{tag['name']}")
    assert announced, "restore must re-announce the tagged view"
    restored = _agg_rows(load(spark, root, _SPEC,
                              interval="2024-01-01/2024-06-01",
                              data_source="ev"))
    assert restored == good

    # 6. catch-up: only the restore's re-announced manifests need new
    # states (same data dirs, new identifiers); nothing is recomputed
    # for identifiers that kept their states
    n_catchup = len(materialize_aggs(
        spark, root, "ev", "daily", dimensions=["event_type"],
        aggregations=[{"name": "value_sum", "type": "doubleSum",
                       "fieldName": "value"}]))
    assert 0 < n_catchup <= 100 + 15  # the re-announced view, not 115+100
    again = len(materialize_aggs(
        spark, root, "ev", "daily", dimensions=["event_type"],
        aggregations=[{"name": "value_sum", "type": "doubleSum",
                       "fieldName": "value"}]))
    assert again == 0  # idempotent: fully caught up

    # 7. the states-only answer equals the restored (= tagged) view
    mat = {
        (r["event_type"], round(r["s"], 6))
        for r in query_materialized(spark, root, "ev", "daily")
        .groupBy("event_type")
        .agg(F.sum("value_sum").alias("s")).collect()
    }
    assert mat == good
