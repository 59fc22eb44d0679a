"""druid_hadoop_utils_spark — a PySpark-native analytics engine with the
capabilities of the ``himanshug/druid-hadoop-utils`` reference library.

The reference (see SURVEY.md) is a Hadoop/Pig connector over Druid 0.9.1
segments: time-partitioned versioned columnar data, declared load specs
(dimensions / metrics / granularity / DimFilter), and a two-phase
approximate-aggregation surface (HLL sketches with partial-bytes /
merge / finalize plus post-aggregation arithmetic).

This package re-expresses that capability surface Spark-first:

- ``sources.segments``  — versioned, time-partitioned Parquet segment layout
  with manifest-based overshadow resolution (reference:
  druid-mr/.../DruidInputFormat.java:98-110 timeline semantics).
- ``plans.spec``        — ``LoadSpec`` parsed from the same JSON shapes the
  reference accepts (PigSegmentLoadSpec.java:28-44,
  DruidInputFormat.java:76-86).
- ``plans.planner``     — ``load(spark, ...) -> DataFrame``: manifest → pruned
  parquet scan → interval + DimFilter predicates → column pruning →
  granularity truncation → optional rollup. Everything is DataFrame /
  Catalyst; no RDDs, no custom rules.
- ``functions``         — DimFilter-tree → Column, granularity → Column,
  Druid AggregatorFactory / PostAggregator JSON → Column (on Spark
  builtins + DataSketches ``hll_*``).
- ``operators``         — large-scale training-data-pipeline extensions:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
  similarity search, text analysis, multimodal column plumbing.
- ``streaming``         — Structured Streaming ingest writing new segment
  versions (extension; the reference is batch-only, SURVEY.md §2.9).
"""

from druid_hadoop_utils_spark.plans.spec import LoadSpec, Metric, parse_interval
from druid_hadoop_utils_spark.plans.planner import load, rollup_df, to_compat_output
from druid_hadoop_utils_spark.functions.filters import filter_to_column
from druid_hadoop_utils_spark.functions.granularity import granularity_expr
from druid_hadoop_utils_spark.functions.aggregators import (
    agg_expr,
    group_aggregate,
    post_agg_expr,
)
from druid_hadoop_utils_spark.sources.segments import (
    compact_manifests,
    create_tag,
    delete_tag,
    diff_views,
    history_horizon,
    list_tags,
    resolve_as_of,
    SegmentManifest,
    table_history,
    timeline_version,
    write_segment,
    list_manifests,
    resolve_visible_windows,
)
from druid_hadoop_utils_spark.sources.ingest import clone_view, publish_segments
from druid_hadoop_utils_spark.sources.dml import (
    delete_where,
    merge_into,
    update_where,
)
from druid_hadoop_utils_spark.sources.maintenance import (
    maintain_table,
    restore_to,
)
from druid_hadoop_utils_spark.sources.changes import (
    changed_windows,
    commit_consumed,
    consume_changes,
    consumer_checkpoint_path,
    consumer_lag,
    consumers_floor_as_of,
    list_consumers,
    read_changes,
)
from druid_hadoop_utils_spark.sources.materialize import (
    catch_up_materialized,
    compact_postings,
    materialize_aggs,
    materialize_postings,
    materialize_signatures,
    query_materialized,
    read_postings,
    read_signatures,
    vacuum_materialized,
)
from druid_hadoop_utils_spark.functions.lookups import (
    lookup_join,
    register_lookup,
    unregister_lookup,
)
from druid_hadoop_utils_spark.sources.druid_segment_export import (
    export_druid_segments,
)
from druid_hadoop_utils_spark.sources.fs import (
    configure_object_store,
    get_fs,
    register_fs_scheme,
)
from druid_hadoop_utils_spark.sources.druid_segment import (
    druid_hll_estimate,
    druid_hll_merge_estimate,
    import_druid_segment,
)
from druid_hadoop_utils_spark import api

__all__ = [
    "LoadSpec",
    "Metric",
    "parse_interval",
    "load",
    "rollup_df",
    "to_compat_output",
    "filter_to_column",
    "granularity_expr",
    "agg_expr",
    "group_aggregate",
    "post_agg_expr",
    "SegmentManifest",
    "write_segment",
    "table_history",
    "timeline_version",
    "history_horizon",
    "list_manifests",
    "compact_manifests",
    "create_tag",
    "delete_tag",
    "diff_views",
    "list_tags",
    "resolve_as_of",
    "resolve_visible_windows",
    "publish_segments",
    "clone_view",
    "maintain_table",
    "restore_to",
    "read_changes",
    "changed_windows",
    "consume_changes",
    "commit_consumed",
    "consumer_checkpoint_path",
    "consumer_lag",
    "consumers_floor_as_of",
    "list_consumers",
    "merge_into",
    "delete_where",
    "update_where",
    "catch_up_materialized",
    "materialize_aggs",
    "compact_postings",
    "materialize_postings",
    "materialize_signatures",
    "query_materialized",
    "read_postings",
    "read_signatures",
    "vacuum_materialized",
    "register_lookup",
    "unregister_lookup",
    "lookup_join",
    "import_druid_segment",
    "export_druid_segments",
    "configure_object_store",
    "get_fs",
    "register_fs_scheme",
    "druid_hll_estimate",
    "druid_hll_merge_estimate",
    "api",
]

__version__ = "0.1.0"
