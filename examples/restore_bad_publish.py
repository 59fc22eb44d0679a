"""Undo a bad publish in O(metadata): tag -> bad publish -> restore.

1. publish v1 and pin it with a named tag (the known-good corpus);
2. a buggy pipeline re-publishes two days at v2 with garbage values —
   readers atomically flip to the bad data (overshadow);
3. ``restore_to("tag:known-good")`` re-announces the tagged view as the
   CURRENT view: existing data dirs under a fresh highest version, no
   data copied or rewritten — instant however large the table is;
4. the incident stays auditable: time travel to just before the restore
   still shows the bad state, and ``table_history()`` logs all three
   announces;
5. ``vacuum`` reclaims the bad v2 bytes — and provably cannot touch the
   re-announced dirs (it refcounts data dirs across manifests).

    python examples/restore_bad_publish.py [sf_dir]

The reference's Druid-0.9 lifecycle has the overshadow half of this
(re-publish to fix); the tag + metadata-only restore is the engine
extension that makes the fix instant and auditable.
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from druid_hadoop_utils_spark import (  # noqa: E402
    create_tag,
    delete_tag,
    load,
    restore_to,
    table_history,
)
from druid_hadoop_utils_spark.session import get_spark  # noqa: E402
from druid_hadoop_utils_spark.sources.ingest import publish_segments  # noqa: E402
from druid_hadoop_utils_spark.sources.maintenance import vacuum  # noqa: E402
from druid_hadoop_utils_spark.sources.segments import publish_stamp  # noqa: E402
from druid_hadoop_utils_spark.sources.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
SPEC = {"granularity": "NONE", "dimensions": ["event_type"],
        "metrics": [{"name": "value", "type": "double"}]}
IV = "2024-01-01/2024-02-01"


def main() -> None:
    spark = get_spark("restore-demo")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="restore_demo_")

    def total():
        df = load(spark, root, SPEC, interval=IV, data_source="events")
        return round(df.agg(F.sum("value")).first()[0], 2)

    ev = load_table(spark, SF_DIR, "events").select(
        "ts", "event_type", "value", "user_id")
    publish_segments(ev, root, "events", version="v1", time_column="ts",
                     bucket="DAY")
    create_tag(root, "events", "known-good")
    print(f"v1 published + tagged 'known-good':  total={total()}")

    bad = ev.where((F.col("ts") >= F.lit("2024-01-05"))
                   & (F.col("ts") < F.lit("2024-01-07"))
                   ).withColumn("value", F.col("value") * 1000)  # the bug
    publish_segments(bad, root, "events", version="v2", time_column="ts",
                     bucket="DAY")
    print(f"bad v2 publish (values x1000):       total={total()}")

    pre_restore = publish_stamp()
    announced = restore_to(root, "events", "tag:known-good")
    print(f"restore_to('tag:known-good'):        total={total()}  "
          f"({len(announced)} metadata announces, zero data moved)")

    bad_then = load(spark, root, SPEC, interval=IV, data_source="events",
                    as_of=pre_restore)
    print(f"audit — as_of just before restore:   total="
          f"{round(bad_then.agg(F.sum('value')).first()[0], 2)}")
    print(f"history log entries: {len(table_history(root, 'events'))}")

    removed = vacuum(root, "events")
    print(f"vacuum with the tag in place: reclaimed {len(removed)} "
          "(the tag is a retention floor — the audit trail survives)")
    delete_tag(root, "events", "known-good")
    removed = vacuum(root, "events")
    print(f"vacuum after delete_tag: reclaimed {len(removed)} hidden "
          f"segments; total still {total()}")


if __name__ == "__main__":
    main()
