import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from druid_hadoop_utils_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("druid-hadoop-utils-spark-tests")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def golden_events(spark):
    """The 3-row golden fixture mirroring the reference's test segment
    (reference: druid-pig/src/test/resources/test-segment/note:1-5)."""
    from pyspark.sql import Row
    from datetime import datetime

    rows = [
        Row(__time=datetime(2014, 10, 22, 0, 0, 0), host=["a.example.com"],
            visited_sum=100, user_host="a.example.com"),
        Row(__time=datetime(2014, 10, 22, 1, 0, 0), host=["b.example.com"],
            visited_sum=150, user_host="b.example.com"),
        Row(__time=datetime(2014, 10, 22, 2, 0, 0), host=["c.example.com"],
            visited_sum=200, user_host="c.example.com"),
    ]
    df = spark.createDataFrame(rows)
    from pyspark.sql import functions as F

    # build the per-row hyperUnique sketch column from the raw values
    # (FIXTURES.md F1): each row carries the HLL state of its own user_host,
    # exactly like a rolled-up Druid segment carries per-row sketch state
    return (
        df.groupBy("__time", "host", "visited_sum", "user_host")
        .agg(F.hll_sketch_agg("user_host").alias("unique_hosts"))
    )
