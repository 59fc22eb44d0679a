"""Example: the reference's SamplePrintMRJob equivalent (reference:
SamplePrintMRJob.java:33-74 — wire up the connector, print every row).

Usage: python examples/print_rows.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from druid_hadoop_utils_spark import load
from druid_hadoop_utils_spark.session import get_spark
from druid_hadoop_utils_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("print-rows-example")
    events = load_table(spark, sf_dir, "events", convert_nanos=False)
    # the same spec shape as the reference's sample-schema.json
    spec = {
        "granularity": "NONE",
        "dimensions": ["event_type"],
        "metrics": [{"name": "value", "type": "double"},
                    {"name": "user_id", "type": "long"}],
    }
    df = load(spark, events, spec,
              interval="1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z",
              time_column="ts")
    df.show(20, truncate=False)
    print(f"total rows: {df.count()}")
    spark.stop()


if __name__ == "__main__":
    main()
