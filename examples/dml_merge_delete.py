"""Row-level DML on a managed segment table, end to end:

1. publish v1 of an events table (DAY segments);
2. MERGE INTO it: corrected rows REPLACE their originals (matched on
   the key within the row's time bucket), brand-new rows INSERT, and a
   never-seen day becomes a new segment — one stamped version flip, only
   the affected buckets rewritten;
3. DELETE WHERE event_type = 'error' through the engine's native filter
   grammar — again only the buckets that actually contain matches are
   rewritten, and a bucket left empty is tombstoned;
4. time-travel to just before the merge (every mutation is a stamped
   announce, so the pre-DML view stays readable until vacuumed).

    python examples/dml_merge_delete.py [sf_dir]

The reference mutates data the Druid way — re-ingest an interval under
a higher version (DruidStorage.java's immutable interval/version
segments); merge_into/delete_where are that operation packaged with
relational semantics, the engine extension a training-data pipeline
needs for corrections and takedowns without table rewrites.
"""

import sys
import tempfile
from datetime import datetime

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import Row, functions as F  # noqa: E402

from druid_hadoop_utils_spark import (  # noqa: E402
    delete_where,
    load,
    merge_into,
    publish_segments,
)
from druid_hadoop_utils_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("dml-example")
    root = tempfile.mkdtemp(prefix="dml_example_")
    rows = [
        Row(ts=datetime(2024, 1, 1 + d, h), event_id=d * 10 + h,
            event_type="view" if h % 2 else "error", value=float(d * 10 + h))
        for d in range(3) for h in range(1, 5)
    ]
    publish_segments(spark.createDataFrame(rows), root, "events",
                     version="v1", time_column="ts", bucket="DAY")
    spec = {"granularity": "NONE",
            "dimensions": ["event_id", "event_type"],
            "metrics": [{"name": "value", "type": "double"}]}

    def show(label):
        df = load(spark, root, spec, interval="2024-01-01/2024-02-01",
                  data_source="events")
        print(f"--- {label}: {df.count()} rows")
        df.orderBy("__time", "event_id").show(50, truncate=False)

    show("initial")

    # 2. merge: correct event 11, insert event 999, open a new day
    updates = spark.createDataFrame([
        Row(__time=datetime(2024, 1, 1, 1), event_id=11,
            event_type="corrected", value=-1.0),
        Row(__time=datetime(2024, 1, 1, 9), event_id=999,
            event_type="late", value=9.9),
        Row(__time=datetime(2024, 1, 7, 1), event_id=701,
            event_type="view", value=7.0),
    ])
    announced = merge_into(spark, root, "events", updates, ["event_id"])
    print(f"merge announced {len(announced)} manifest(s)")
    show("after merge")

    # 3. row-level delete through the DimFilter grammar
    res = delete_where(spark, root, "events",
                       {"type": "selector", "dimension": "event_type",
                        "value": "error"})
    print(f"delete rewrote {len(res['announced'])} manifest(s), "
          f"tombstoned {res['deleted_buckets'] or 'none'}")
    show("after delete")

    # 4. the pre-DML view is still one as_of away
    from druid_hadoop_utils_spark import table_history

    first_stamp = min(e["publishedAt"] for e in
                      table_history(root, "events"))
    old = load(spark, root, spec, interval="2024-01-01/2024-02-01",
               data_source="events", as_of=first_stamp)
    print(f"rows at the first publish instant: {old.count()} "
          "(the un-merged, un-deleted view)")


if __name__ == "__main__":
    main()
