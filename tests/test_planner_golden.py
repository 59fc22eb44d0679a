"""End-to-end golden tests — the Spark re-expression of the reference's two
E2E tests (reference: DruidStorageTest.java:46-54 golden Pig output;
DruidInputFormatTest.java:124-163 golden MR assertions), plus the
multi-segment/overshadow/pruning coverage the reference lacks
(FIXTURES.md F1/F2)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from druid_hadoop_utils_spark import LoadSpec, load, rollup_df, write_segment
from druid_hadoop_utils_spark.functions.aggregators import agg_expr

SPEC = {
    "granularity": "NONE",
    "dimensions": ["host"],
    "metrics": [
        {"name": "visited_sum", "type": "long"},
        {"name": "unique_hosts", "type": "hyperUnique"},
    ],
}

INTERVAL_ALL = "1970-01-01/3000-01-01"


@pytest.fixture(scope="module")
def table_root(tmp_path_factory, golden_events):
    root = str(tmp_path_factory.mktemp("tables"))
    write_segment(
        golden_events.drop("user_host"),
        root, "events_fixture", "2014-10-22/2014-10-23", "v1",
    )
    return root


def test_golden_query_end_to_end(spark, table_root):
    """The §7.2 minimum slice: load → group → sum + sketch-estimate, matching
    the reference's druid_exporter.pig:6-17 workflow and golden values."""
    df = load(spark, table_root, SPEC, interval=INTERVAL_ALL, data_source="events_fixture")
    out = (
        df.groupBy("__time", "host")
        .agg(
            F.sum("visited_sum").alias("visited_sum"),
            agg_expr({"type": "hyperUnique", "name": "unique_hosts",
                      "fieldName": "unique_hosts"}, df.schema),
        )
        .orderBy("__time")
        .collect()
    )
    assert len(out) == 3
    assert [r.visited_sum for r in out] == [100, 150, 200]
    assert [r.host for r in out] == [["a.example.com"], ["b.example.com"], ["c.example.com"]]
    # each row's sketch holds exactly 1 distinct value (golden ≈1.0; our
    # frozen golden is exactly 1.0 — SURVEY.md §7.4 HLL-parity decision)
    assert all(r.unique_hosts == 1.0 for r in out)
    # DruidStorageTest.java:46 equivalent: total visited_sum = 450
    assert sum(r.visited_sum for r in out) == 450


def test_schema_shape_matches_reference_tuple_order(spark, table_root):
    df = load(spark, table_root, SPEC, interval=INTERVAL_ALL, data_source="events_fixture")
    # (__time, dims..., metrics...) — reference DruidStorage.java:120-157
    assert df.columns == ["__time", "host", "visited_sum", "unique_hosts"]
    types = dict(df.dtypes)
    assert types["__time"] == "timestamp"
    assert types["host"] == "array<string>"
    assert types["visited_sum"] == "bigint"
    assert types["unique_hosts"] == "binary"


def test_granularity_day_truncates(spark, table_root):
    spec = dict(SPEC, granularity="DAY")
    df = load(spark, table_root, spec, interval=INTERVAL_ALL, data_source="events_fixture")
    times = [r["__time"] for r in df.select("__time").collect()]
    assert set(times) == {datetime(2014, 10, 22)}


def test_granularity_day_with_rollup(spark, table_root):
    spec = LoadSpec.from_json(dict(SPEC, granularity="DAY"))
    df = load(spark, table_root, spec, interval=INTERVAL_ALL,
              data_source="events_fixture", rollup=True)
    rows = df.collect()
    # 3 hourly rows × distinct hosts → still 3 groups per (day, host)
    assert len(rows) == 3
    assert sum(r.visited_sum for r in rows) == 450
    # rolled-up sketch column stays binary (re-aggregable, A3 semantics)
    assert dict(df.dtypes)["unique_hosts"] == "binary"
    merged = df.agg(
        F.hll_sketch_estimate(F.hll_union_agg("unique_hosts")).alias("e")
    ).first().e
    assert merged == 3


def test_interval_filter_half_open(spark, table_root):
    df = load(spark, table_root, SPEC, interval="2014-10-22T01:00:00/2014-10-22T02:00:00",
              data_source="events_fixture")
    rows = df.collect()
    assert len(rows) == 1 and rows[0].visited_sum == 150


def test_dim_filter_through_spec(spark, table_root):
    spec = dict(SPEC, filter={"type": "selector", "dimension": "host",
                              "value": "b.example.com"})
    df = load(spark, table_root, spec, interval=INTERVAL_ALL, data_source="events_fixture")
    rows = df.collect()
    assert len(rows) == 1 and rows[0].visited_sum == 150


class TestMultiSegment:
    """FIXTURES.md F2 — overshadow + pruning with real files."""

    @pytest.fixture(scope="class")
    def multiseg_root(self, tmp_path_factory, spark, golden_events):
        root = str(tmp_path_factory.mktemp("multiseg"))
        base = golden_events.drop("user_host")
        write_segment(base, root, "events_multiseg", "2014-10-22/2014-10-23", "v1")
        # v2 of the same bucket: visited_sum ×10 → must overshadow v1
        write_segment(base.withColumn("visited_sum", F.col("visited_sum") * 10),
                      root, "events_multiseg", "2014-10-22/2014-10-23", "v2")
        # a second, later bucket at v1
        shifted = base.withColumn("__time", F.col("__time") + F.expr("INTERVAL 1 DAY"))
        write_segment(shifted, root, "events_multiseg", "2014-10-23/2014-10-24", "v1")
        return root

    def test_overshadow_newer_version_wins(self, spark, multiseg_root):
        df = load(spark, multiseg_root, SPEC, interval="2014-10-22/2014-10-23",
                  data_source="events_multiseg")
        assert sum(r.visited_sum for r in df.collect()) == 4500  # v2 values
        assert all("v=v2" in f for f in df.inputFiles())  # v1 never read

    def test_interval_prunes_file_set(self, spark, multiseg_root):
        df = load(spark, multiseg_root, SPEC, interval="2014-10-23/2014-10-24",
                  data_source="events_multiseg")
        files = df.inputFiles()
        assert files and all(f.split("/")[-4].startswith("2014-10-23") for f in files)
        assert sum(r.visited_sum for r in df.collect()) == 450

    def test_query_spanning_versions_mixes_correctly(self, spark, multiseg_root):
        df = load(spark, multiseg_root, SPEC, interval="2014-10-22/2014-10-24",
                  data_source="events_multiseg")
        assert sum(r.visited_sum for r in df.collect()) == 4500 + 450

    def test_multi_interval_segment_load(self, spark, multiseg_root):
        """Two disjoint intervals over a segment table: span-scan + OR
        predicate, overshadow still applied per point in time. Hours
        [00,01) of day 1 (v2 values) + all of day 2 (v1), hour 01-02
        of day 1 excluded."""
        df = load(spark, multiseg_root, SPEC,
                  interval=["2014-10-22T00/2014-10-22T01",
                            "2014-10-23/2014-10-24"],
                  data_source="events_multiseg")
        # day1 hour0: a.example.com at v2 (100×10); day2: all three at v1
        assert sum(r.visited_sum for r in df.collect()) == 1000 + 450


def test_raw_nanos_wide_interval_no_overflow(spark, tmp_path):
    """An interval beyond nanos-representable range (year 3000) must clamp
    to int64 bounds, not overflow (regression: examples/print_rows.py).

    The driver's testdata moved to timestamp[us], so the nanos path is
    pinned with a synthetic timestamp[ns] parquet (read back as raw longs
    under nanosAsLong)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from druid_hadoop_utils_spark.sources.tables import load_table

    path = str(tmp_path / "ns_events")
    tbl = pa.table({
        "ts": pa.array([1704067200_000_000_000 + i * 3_600_000_000_000
                        for i in range(48)], pa.timestamp("ns")),
        "event_type": pa.array(["click", "view"] * 24),
        "value": pa.array([float(i) for i in range(48)]),
    })
    pq.write_table(tbl, path + ".parquet")
    ev = load_table(spark, str(tmp_path), "ns_events", convert_nanos=False)
    assert dict(ev.dtypes)["ts"] == "bigint"  # raw epoch-nanos longs
    spec = {"granularity": "NONE", "dimensions": ["event_type"],
            "metrics": [{"name": "value", "type": "double"}]}
    df = load(spark, ev, spec, interval="1970-01-01/3000-01-01", time_column="ts")
    assert df.count() == ev.count()
    # and a tight interval still prunes + converts correctly
    day1 = load(spark, ev, spec, interval="2024-01-01/2024-01-02", time_column="ts")
    assert day1.count() == 24
    assert dict(day1.dtypes)["__time"] == "timestamp"


def test_load_plain_parquet_events(spark, sf_dir):
    """load() also works directly over the driver's events table (no
    manifests), mapping ts → __time."""
    from druid_hadoop_utils_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    spec = {"granularity": "HOUR", "dimensions": ["event_type"],
            "metrics": [{"name": "value", "type": "double"}]}
    df = load(spark, ev, spec, interval="2024-01-01/2024-01-02", time_column="ts")
    assert df.columns == ["__time", "event_type", "value"]
    assert df.count() > 0


def test_partial_overshadow_end_to_end(spark, tmp_path, golden_events):
    """File-level partial overshadow: v1 spans two days; v2 republishes only
    day 1. A query over both days must read v2's day-1 rows and v1's day-2
    rows — exercising the window-filtered union branch of _scan_segments."""
    base = golden_events.drop("user_host")
    day2 = base.withColumn("__time", F.col("__time") + F.expr("INTERVAL 1 DAY"))
    v1 = base.unionByName(day2)  # 6 rows across 2014-10-22 and 10-23
    write_segment(v1, str(tmp_path), "ds", "2014-10-22/2014-10-24", "v1")
    v2 = base.withColumn("visited_sum", F.col("visited_sum") * 100)
    write_segment(v2, str(tmp_path), "ds", "2014-10-22/2014-10-23", "v2")

    spec = {"granularity": "NONE", "dimensions": ["host"],
            "metrics": [{"name": "visited_sum", "type": "long"}]}
    df = load(spark, str(tmp_path), spec, interval="2014-10-22/2014-10-24",
              data_source="ds")
    rows = df.collect()
    assert len(rows) == 6
    by_day = {}
    for r in rows:
        by_day.setdefault(r["__time"].day, []).append(r.visited_sum)
    assert sorted(by_day[22]) == [10000, 15000, 20000]  # v2 values
    assert sorted(by_day[23]) == [100, 150, 200]        # v1 survives day 2
    # both versions' files are read (v1 window-filtered, v2 whole)
    files = df.inputFiles()
    assert any("v=v1" in f for f in files) and any("v=v2" in f for f in files)
