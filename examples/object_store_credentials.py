"""Explicit object-store credentials, wired once for BOTH I/O halves.

The engine reads/writes a managed table through two stacks:

* METADATA (manifests, materialized states, result cache, ANN
  artifacts) — driver-side through ``sources/fs.py`` (pyarrow);
* DATA (the parquet segments) — executor-side through Spark's Hadoop
  s3a connector.

With environment/instance-profile credentials, neither needs any setup:
``table_root="s3://bucket/warehouse"`` just works (both stacks resolve
the standard AWS chain). With EXPLICIT keys or a custom endpoint
(MinIO, on-prem object stores), each stack normally needs its own
plumbing — ``configure_object_store`` does both from one call:

    import druid_hadoop_utils_spark as eng
    from druid_hadoop_utils_spark.session import get_spark

    spark = get_spark("prod")
    eng.configure_object_store(
        "s3://bucket/warehouse", spark,
        access_key="...", secret_key="...",
        endpoint="https://minio.internal:9000",  # omit for real AWS
        region="us-east-1",
    )
    # from here every managed-table call uses the credentials on both
    # sides — same code as any other root:
    eng.publish_segments(df, "s3://bucket/warehouse", "events",
                         version="v1", time_column="ts", bucket="DAY")
    eng.api.druid_query(spark, "s3://bucket/warehouse", query)

At session-BUILD time (before a SparkSession exists), use the returned
dict instead:

    conf = eng.configure_object_store("s3://bucket/warehouse", ...)
    builder = SparkSession.builder
    for k, v in conf.items():
        builder = builder.config("spark.hadoop." + k, v)

This example runs the OFFLINE-SAFE part (no bucket is contacted):
construct the credentialed filesystems, show the primed seam and the
conf that would reach Spark.

Usage: python examples/object_store_credentials.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import druid_hadoop_utils_spark as eng  # noqa: E402
from druid_hadoop_utils_spark.sources.fs import ArrowMetaFS, get_fs  # noqa: E402

ROOT = "s3://example-bucket/warehouse"
conf = eng.configure_object_store(
    ROOT,
    access_key="EXAMPLEKEY", secret_key="EXAMPLESECRET",
    endpoint="http://localhost:9000", region="us-east-1",
)

print("spark.hadoop.* conf for the data side:")
for k, v in sorted(conf.items()):
    print(f"  {k} = {v}")

fs = get_fs(ROOT + "/events/_segments")
assert isinstance(fs, ArrowMetaFS) and not fs.atomic_dir_rename
print("\nmetadata seam primed:", type(fs).__name__,
      "| dir publishes use the pointer protocol (no rename assumed)")
print("spark reads data at:", fs.spark_url(ROOT + "/events/part.parquet"))
