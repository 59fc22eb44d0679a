"""Z-order layout: key bounds, locality, file-stat pruning, publish wiring."""

import glob

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.sources.layout import zorder_key, zorder_layout


@pytest.fixture(scope="module")
def grid(spark):
    # 64x64 uniform 2-D grid, shuffled ids
    rows = [Row(i=x * 64 + y, x=float(x), y=float(y))
            for x in range(64) for y in range(64)]
    return spark.createDataFrame(rows)


def test_key_bounds_and_determinism(spark, grid):
    bits = 8
    z = grid.select(zorder_key(grid, ["x", "y"], bits=bits).alias("z"))
    stats = z.agg(F.min("z").alias("lo"), F.max("z").alias("hi")).first()
    assert stats.lo >= 0 and stats.hi < (1 << (bits * 2))
    a = [r.z for r in z.orderBy("z").collect()]
    b = [r.z for r in grid.repartition(13).select(
        zorder_key(grid, ["x", "y"], bits=bits).alias("z")).orderBy("z").collect()]
    assert a == b


def test_zorder_clusters_both_dimensions(spark, grid):
    """Split the z-sorted output into consecutive chunks: each chunk must
    span a SMALL range of BOTH columns (the Morton property); a single
    -column sort would leave the second column's per-chunk range global."""
    out = zorder_layout(grid, ["x", "y"], bits=6, num_partitions=1)
    rows = out.collect()  # preserved z order (one partition)
    chunk = 256  # 16 chunks of the 4096 rows
    for s in range(0, len(rows), chunk):
        part = rows[s:s + chunk]
        dx = max(r.x for r in part) - min(r.x for r in part)
        dy = max(r.y for r in part) - min(r.y for r in part)
        # each 1/16th of the curve covers a 16x16 block (range 15) of the
        # 64-point axes; allow slack for bucket-boundary effects
        assert dx <= 24 and dy <= 24, (s, dx, dy)
    # sanity: a lexicographic x-sort leaves dy at the full range
    lex = sorted(rows, key=lambda r: (r.x, r.y))
    part = lex[:chunk]
    assert max(r.y for r in part) - min(r.y for r in part) == 63.0


def test_file_stats_prune_on_second_dimension(spark, grid, tmp_path):
    """Written z-ordered, a predicate on the SECOND column overlaps only a
    fraction of the files' min/max stats; written unsorted it overlaps
    (almost) all of them — the row-group/file-skipping win at read time."""
    import pyarrow.parquet as pq

    zdir, udir = str(tmp_path / "z"), str(tmp_path / "u")
    zorder_layout(grid, ["x", "y"], bits=6, num_partitions=16) \
        .write.parquet(zdir)
    grid.repartition(16).write.parquet(udir)

    def overlap_fraction(d):
        files = sorted(glob.glob(f"{d}/*.parquet"))
        hit = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            lo = min(md.row_group(i).column(2).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(2).statistics.max
                     for i in range(md.num_row_groups))
            if not (hi < 10.0 or lo > 16.0):  # y in [10, 16]
                hit += 1
        return hit / len(files)

    assert overlap_fraction(udir) >= 0.9
    assert overlap_fraction(zdir) <= 0.5


def test_string_and_constant_columns(spark):
    df = spark.createDataFrame(
        [Row(i=i, s=f"key{i % 7}", c=1.0) for i in range(100)])
    z = df.select(zorder_key(df, ["s", "c"], bits=4).alias("z")).collect()
    assert all(r.z >= 0 for r in z)
    # constant column contributes zero bits but doesn't break the key
    assert len({r.z for r in z}) > 1


def test_validation(spark, grid):
    with pytest.raises(ValueError, match="1..4"):
        zorder_key(grid, [], bits=4)
    with pytest.raises(ValueError, match="60-bit"):
        zorder_key(grid, ["x", "y"], bits=31)


def test_publish_segments_zorder_roundtrip(spark, tmp_path):
    from datetime import datetime

    from druid_hadoop_utils_spark.plans.planner import load
    from druid_hadoop_utils_spark.sources.ingest import publish_segments

    rows = [Row(__time=datetime(2024, 1, 1, i % 24), a=float(i % 50),
                b=float((i * 7) % 50), v=float(i)) for i in range(2000)]
    df = spark.createDataFrame(rows)
    root = str(tmp_path / "tbl")
    publish_segments(df, root, "ev", "v1", zorder=["a", "b"])
    spec = {"granularity": "NONE", "dimensions": ["a", "b"],
            "metrics": [{"name": "v", "type": "double"}]}
    back = load(spark, root, spec, interval="2020-01-01/2030-01-01",
                data_source="ev")
    assert back.count() == 2000
    got = sorted((r.a, r.b, r.v) for r in back.collect())
    want = sorted((r.a, r.b, r.v) for r in rows)
    assert got == want
    with pytest.raises(ValueError, match="not both"):
        publish_segments(df, root, "ev", "v2", sort_by=["a"], zorder=["b"])


def test_publish_zorder_with_shards(spark, tmp_path):
    from datetime import datetime

    from druid_hadoop_utils_spark.plans.planner import load
    from druid_hadoop_utils_spark.sources.ingest import publish_segments

    rows = [Row(__time=datetime(2024, 1, 1, i % 24), a=float(i % 50),
                v=float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows)
    root = str(tmp_path / "tbl")
    publish_segments(df, root, "ev", "v1", zorder=["a", "v"],
                     shards_per_bucket=2)
    spec = {"granularity": "NONE", "dimensions": ["a"],
            "metrics": [{"name": "v", "type": "double"}]}
    back = load(spark, root, spec, interval="2020-01-01/2030-01-01",
                data_source="ev")
    assert back.count() == 1000
    assert sorted(r.v for r in back.collect()) == [float(i) for i in range(1000)]
