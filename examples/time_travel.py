"""Time travel on a managed segment table, end to end:

1. publish v1 of an events table; re-publish a two-day window at v2
   with corrected values (overshadow — readers flip atomically);
2. query the table AS OF an instant between the two publishes — the
   timeline resolves over only the manifests announced by then, so the
   read reproduces exactly what a reader at that moment saw;
3. audit the table with ``table_history()`` (the publish log: stamps,
   versions, tombstones, current visibility);
4. vacuum with a RETENTION WINDOW: only segments no surviving as_of
   view needs are reclaimed, and the history horizon advances to the
   cutoff — as_of reads inside the window keep working, while earlier
   ones refuse loudly instead of silently answering from whatever
   survives.

    python examples/time_travel.py [sf_dir]

The reference's timeline is the live-only Druid 0.9 view
(DruidInputFormat.java:98-110); reproducible historical reads are the
engine extension a training-data pipeline needs for lineage — "which
corpus snapshot did this run train on" is answered by (table_root,
as_of) instead of a copied dataset.
"""

import sys
import tempfile
from datetime import datetime, timezone

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from druid_hadoop_utils_spark import (  # noqa: E402
    clone_view,
    create_tag,
    delete_tag,
    history_horizon,
    load,
    table_history,
)
from druid_hadoop_utils_spark.session import get_spark  # noqa: E402
from druid_hadoop_utils_spark.sources.ingest import publish_segments  # noqa: E402
from druid_hadoop_utils_spark.sources.maintenance import vacuum  # noqa: E402
from druid_hadoop_utils_spark.sources.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
SPEC = {"granularity": "NONE", "dimensions": ["event_type"],
        "metrics": [{"name": "value", "type": "double"}]}
IV = "2024-01-03/2024-01-10"


def main() -> None:
    spark = get_spark("time-travel")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="time_travel_")

    # 1. two publishes (explicit stamps make the demo deterministic;
    #    production publishes stamp automatically)
    ev = load_table(spark, SF_DIR, "events").select(
        "ts", "event_type", "value", "user_id")
    publish_segments(ev, root, "events", version="v1", time_column="ts",
                     bucket="DAY", published_at="2024-06-01T00:00:00+00:00")
    fix = ev.where((F.col("ts") >= F.lit("2024-01-05"))
                   & (F.col("ts") < F.lit("2024-01-07"))
                   ).withColumn("value", F.col("value") * 2)
    publish_segments(fix, root, "events", version="v2", time_column="ts",
                     bucket="DAY", published_at="2024-06-02T00:00:00+00:00")

    # 2. the same query at two instants
    def total(as_of=None):
        df = load(spark, root, SPEC, interval=IV, data_source="events",
                  as_of=as_of)
        return round(df.agg(F.sum("value")).first()[0], 2)

    print(f"current view (v2 overshadows two days): {total()}")
    print(f"as of 2024-06-01T12:00 (v1 only):       "
          f"{total('2024-06-01T12:00:00')}")

    # 3. the publish log
    print("\ntable_history():")
    for h in table_history(root, "events")[:6]:
        print(f"  {h['publishedAt']}  {h['version']:<3} "
              f"{h['interval']}  visible={h['visible']}")
    print("  ...")

    # 3b. named tags: pin the pre-fix view once, read it by name forever
    #     (metadata only — the training-lineage handle: (root, tag));
    #     a tag is a standing vacuum retention floor until deleted
    create_tag(root, "events", "train-run-1", as_of="2024-06-01T12:00:00")
    print(f"\ntag 'train-run-1' pinned: {total('tag:train-run-1')} "
          f"(== as-of read above)")
    print(f"vacuum with the tag in place: removed "
          f"{len(vacuum(root, 'events'))} (the tagged view holds v1)")
    #     ...and ship the pinned corpus: one distributed job clones the
    #     tagged view to a fresh independent table (+_clone.json lineage)
    dest = tempfile.mkdtemp(prefix="time_travel_clone_")
    n_seg = len(clone_view(spark, root, "events", dest,
                           as_of="tag:train-run-1"))
    shipped = load(spark, dest, SPEC, interval=IV, data_source="events")
    print(f"clone_view('tag:train-run-1') -> {n_seg} segments, sum "
          f"{round(shipped.agg(F.sum('value')).first()[0], 2)}")
    delete_tag(root, "events", "train-run-1")

    # 4. retention vacuum: keep every view from 2024-06-01T06:00 on —
    #    v1 is still needed by the pre-v2 views, so nothing reclaims
    keep_from = datetime(2024, 6, 1, 6, tzinfo=timezone.utc)
    retain = (datetime.now(timezone.utc) - keep_from).total_seconds()
    print(f"\nvacuum(retain to {keep_from.isoformat()}): "
          f"removed {len(vacuum(root, 'events', retain_history_s=retain))}")
    # no retention: the overshadowed v1 days reclaim, horizon -> now
    removed = vacuum(root, "events")
    print(f"vacuum(no retention): removed {len(removed)} "
          f"(horizon now {history_horizon(root, 'events')})")
    try:
        total("2024-06-01T12:00:00")
    except ValueError as e:
        print(f"as_of before horizon refuses: {str(e)[:80]}...")


if __name__ == "__main__":
    main()
