"""Migrate a real Druid v9 segment into the engine and query it.

Runs against the reference's own test fixture (a genuine Druid 0.9
segment: index.zip with smoosh chunks, LZ4-compressed columns, a
hyperUnique metric), reproducing the reference's Pig workflow
(druid_exporter.pig:6-17) end to end on the migrated data:

    python examples/migrate_druid_segment.py
"""

import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from druid_hadoop_utils_spark import (  # noqa: E402
    druid_hll_merge_estimate,
    import_druid_segment,
    load,
)
from druid_hadoop_utils_spark.session import get_spark  # noqa: E402

FIXTURE = "/root/reference/druid-pig/src/test/resources/test-segment"


def main() -> None:
    spark = get_spark("migrate-druid-segment")
    root = tempfile.mkdtemp(prefix="migrated_")

    manifest = import_druid_segment(spark, FIXTURE, root)
    print(f"imported {manifest.identifier}\n  -> {manifest.path}")

    spec = {"granularity": "NONE", "dimensions": ["host"],
            "metrics": [{"name": "visited_sum", "type": "long"},
                        {"name": "unique_hosts", "type": "hyperUnique"}]}
    df = load(spark, root, spec, interval="1970-01-01/3000-01-01",
              data_source=manifest.data_source)

    # the reference Pig workflow: group by (timestamp, host), sum visits,
    # merge + finalize the Druid HLL sketches
    out = (
        df.groupBy("__time", "host")
        .agg(F.sum("visited_sum").alias("visited_sum"),
             druid_hll_merge_estimate(
                 F.collect_list("unique_hosts")).alias("unique_hosts"))
        .orderBy("__time")
    )
    out.show(truncate=False)
    total = out.agg(F.sum("visited_sum")).first()[0]
    print(f"total visited_sum: {total} (reference expects 450)")
    spark.stop()


if __name__ == "__main__":
    main()
