"""The reference's canonical end-to-end workflow, line for line.

Reference (druid-pig/src/test/resources/druid_exporter.pig):

    register ... jars ...
    define hyperUniqueAggregator  NonFinalizingAggregatorFactoryAdapter(
        '{"type":"hyperUnique","name":"unique_hosts","fieldName":"unique_hosts"}',
        'hyperUnique');                                            -- :3
    define hyperUniquePostAgg     DoublePostAggregatorAdapter(
        '{"type":"hyperUniqueCardinality","name":"unique_hosts",
          "fieldName":"unique_hosts"}', ...);                      -- :4
    A = load 'testDatasource' using DruidStorage(
        'sample-schema.json', '<interval>');                       -- :6
    B = group A by (druid_timestamp, host);                        -- :9
    C = foreach B generate group.druid_timestamp, group.host,
        SUM(A.visited_sum) as visited_sum,
        hyperUniqueAggregator(A.unique_hosts) as unique_hosts;     -- :12
    D = foreach C generate druid_timestamp, host, visited_sum,
        hyperUniquePostAgg(unique_hosts);                          -- :15
    dump D;                                                        -- :17

Usage: python examples/druid_workflow.py
"""

import json
import os
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark import (
    LoadSpec,
    agg_expr,
    load,
    post_agg_expr,
    to_compat_output,
    write_segment,
)
from druid_hadoop_utils_spark.session import get_spark


def main() -> None:
    spark = get_spark("druid-workflow-example")
    root = tempfile.mkdtemp()

    # --- publish the golden 3-row segment (test-segment/note:1-5) ---
    rows = [
        Row(__time=datetime(2014, 10, 22, 0), host=["a.example.com"],
            visited_sum=100, user="a.example.com"),
        Row(__time=datetime(2014, 10, 22, 1), host=["b.example.com"],
            visited_sum=150, user="b.example.com"),
        Row(__time=datetime(2014, 10, 22, 2), host=["c.example.com"],
            visited_sum=200, user="c.example.com"),
    ]
    seg = (
        spark.createDataFrame(rows)
        .groupBy("__time", "host", "visited_sum")
        .agg(F.hll_sketch_agg("user").alias("unique_hosts"))
    )
    write_segment(seg, root, "testDatasource", "2014-10-22/2014-10-23", "v1")

    # --- sample-schema.json (reference sample-schema.json:1-8) ---
    schema_file = os.path.join(root, "sample-schema.json")
    with open(schema_file, "w") as f:
        json.dump({
            "granularity": "DAY",
            "dimensions": ["host"],
            "metrics": [{"name": "visited_sum", "type": "long"},
                        {"name": "unique_hosts", "type": "hyperUnique"}],
        }, f)

    # A = load ... using DruidStorage('sample-schema.json', '<interval>')
    spec = LoadSpec.from_file(schema_file, data_source="testDatasource")
    A = load(spark, root, spec,
             interval="2014-10-21T00:00:00.000Z/2014-10-26T00:00:00.000Z",
             data_source="testDatasource")

    # B/C = group by (druid_timestamp, host); SUM + hyperUniqueAggregator
    # (the NonFinalizing adapter == agg_expr(finalize=False): sketch bytes)
    C = A.groupBy("__time", "host").agg(
        F.sum("visited_sum").alias("visited_sum"),
        agg_expr({"type": "hyperUnique", "name": "unique_hosts",
                  "fieldName": "unique_hosts"}, A.schema, finalize=False),
    )

    # D = foreach C generate ... hyperUniquePostAgg(unique_hosts)
    D = C.select(
        "__time", "host", "visited_sum",
        post_agg_expr({"type": "hyperUniqueCardinality",
                       "name": "unique_hosts", "fieldName": "unique_hosts"}),
    )

    # dump D (druid_timestamp-first string shape, like the Pig tuples)
    to_compat_output(D.orderBy("__time")).show(truncate=False)
    total = D.agg(F.sum("visited_sum")).first()[0]
    print(f"total visited_sum = {total} (reference golden: 450)")
    spark.stop()


if __name__ == "__main__":
    main()
