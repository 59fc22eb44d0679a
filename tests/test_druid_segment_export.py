"""Druid v9 segment EXPORT (sources/druid_segment_export.py) — the
migrate-OUT half of the loop (VERDICT r6 stretch item 8).

The strongest check available without a live Druid: the writer's output
is decoded by the engine's own v9 READER (sources/druid_segment.py),
which was itself validated byte-for-byte against the reference's golden
segment — and the full loop runs: import the reference golden → publish
as an engine segment → export as v9 → re-import → identical rows,
including the raw hyperUnique sketch bytes and their HLL estimate
(DruidStorageTest.java:50-52's 1.0002442201269182).
"""

import json
import struct

import pytest

from druid_hadoop_utils_spark.sources.druid_segment import (
    druid_hll_estimate_bytes,
    read_segment,
    read_smoosh,
)
from druid_hadoop_utils_spark.sources.druid_segment_export import (
    _concise_bitmap,
    export_druid_segments,
    write_v9_segment,
)

GOLDEN = "/root/reference/druid-pig/src/test/resources/test-segment"


def test_concise_bitmap_matches_golden_shape():
    # the golden's host bitmaps are single literal words 0x80000001/2/4
    assert _concise_bitmap([0]) == struct.pack(">I", 0x80000001)
    assert _concise_bitmap([1]) == struct.pack(">I", 0x80000002)
    assert _concise_bitmap([2]) == struct.pack(">I", 0x80000004)
    assert _concise_bitmap([]) == b""
    # bit 31 starts the second word
    assert _concise_bitmap([31]) == struct.pack(
        ">II", 0x80000000, 0x80000001)


def test_write_then_read_all_column_kinds(tmp_path):
    cols = {
        "__time": {"kind": "LONG",
                   "values": [1000, 2000, 2000, 3000, 4000]},
        "host": {"kind": "STRING",
                 "values": ["b", "a", "", "a", "c"]},
        "tags": {"kind": "STRING", "multi_value": True,
                 "values": [["x", "y"], ["y"], [], ["z", "x", "y"], ["x"]]},
        "n": {"kind": "LONG", "values": [5, -3, 0, 7, 9]},
        "ratio": {"kind": "FLOAT", "values": [0.5, 1.25, -2.0, 0.0, 3.5]},
        "sketch": {"kind": "COMPLEX", "type_name": "hyperUnique",
                   "values": [b"\x01\x02", b"", b"\xff" * 10, b"x", b"y"]},
    }
    out = write_v9_segment(
        dict(cols), str(tmp_path / "seg"), "ds",
        "1970-01-01T00:00:01/1970-01-01T00:00:05", "v1",
        dimensions=["host", "tags"], metrics=["n", "ratio", "sketch"])
    back = read_segment(out)
    assert back["__time"].values == cols["__time"]["values"]
    assert back["host"].values == cols["host"]["values"]
    assert back["tags"].multi_value
    assert back["tags"].values == cols["tags"]["values"]
    assert back["n"].values == cols["n"]["values"]
    assert back["ratio"].values == cols["ratio"]["values"]
    assert [bytes(v) for v in back["sketch"].values] \
        == cols["sketch"]["values"]
    files = read_smoosh(out)
    assert set(files) == {"__time", "host", "tags", "n", "ratio",
                          "sketch", "index.drd"}
    desc = json.load(open(f"{out}/descriptor.json"))
    assert desc["binaryVersion"] == 9
    assert desc["dimensions"] == "host,tags"
    assert desc["metrics"] == "n,ratio,sketch"


def test_unsorted_time_refused(tmp_path):
    with pytest.raises(ValueError, match="ascending"):
        write_v9_segment(
            {"__time": {"kind": "LONG", "values": [2, 1]}},
            str(tmp_path / "seg"), "ds", "1970/1971", "v1", [], [])


def test_blocked_encodings_refused(tmp_path):
    # >16M distinct string values would need 4-byte dictionary ids
    from druid_hadoop_utils_spark.sources.druid_segment_export import (
        _vsize_ints,
    )

    with pytest.raises(ValueError, match="4-byte"):
        _vsize_ints([1 << 24])


def test_block_spanning_roundtrip(tmp_path):
    """Values crossing block boundaries (size_per) decode intact."""
    n = 70000  # > one 0x2000 long block and > one 0x4000 id block
    cols = {
        "__time": {"kind": "LONG", "values": list(range(n))},
        "host": {"kind": "STRING",
                 "values": [f"h{i % 300}" for i in range(n)]},
        "n": {"kind": "LONG", "values": [i * 7 - 3 for i in range(n)]},
    }
    out = write_v9_segment(dict(cols), str(tmp_path / "seg"), "ds",
                           "1970/1971", "v1", ["host"], ["n"])
    back = read_segment(out)
    assert back["__time"].values == cols["__time"]["values"]
    assert back["host"].values == cols["host"]["values"]
    assert back["n"].values == cols["n"]["values"]


def test_double_lossy_gate(spark, tmp_path):
    from datetime import datetime

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.sources.segments import write_segment

    root = str(tmp_path / "root")
    df = spark.createDataFrame(
        [Row(__time=datetime(2024, 1, 1), host=["a"], value=1.5)])
    write_segment(df, root, "ev", "2024-01-01/2024-01-02", "v1")
    with pytest.raises(ValueError, match="allow_lossy"):
        export_druid_segments(spark, root, "ev", str(tmp_path / "out"))
    dirs = export_druid_segments(spark, root, "ev",
                                 str(tmp_path / "out"), allow_lossy=True)
    back = read_segment(dirs[0])
    assert back["value"].values == [1.5]


def test_golden_migration_loop(spark, tmp_path):
    """Reference golden → import → export → re-import: identical rows,
    sketch bytes bit-equal, HLL estimate preserved to the reference's
    own printed value."""
    from druid_hadoop_utils_spark.plans.planner import load
    from druid_hadoop_utils_spark.sources.druid_segment import (
        import_druid_segment,
    )

    root1 = str(tmp_path / "r1")
    root2 = str(tmp_path / "r2")
    import_druid_segment(spark, GOLDEN, root1)
    dirs = export_druid_segments(
        spark, root1, "testds", str(tmp_path / "out"),
        complex_types={"unique_hosts": "hyperUnique"})
    assert len(dirs) == 1

    # the exported segment decodes to the same values the golden does
    golden_cols = read_segment(GOLDEN)
    exported_cols = read_segment(dirs[0])
    assert exported_cols["__time"].values == golden_cols["__time"].values
    assert exported_cols["visited_sum"].values \
        == golden_cols["visited_sum"].values
    assert [bytes(v) for v in exported_cols["unique_hosts"].values] \
        == [bytes(v) for v in golden_cols["unique_hosts"].values]
    # host rode through the engine as one-element arrays and exports
    # back to a single-value dictionary column, like the golden
    assert not exported_cols["host"].multi_value
    assert exported_cols["host"].values == golden_cols["host"].values

    # re-import and compare through the engine load path
    import_druid_segment(spark, dirs[0], root2)
    spec = {"granularity": "NONE", "dimensions": ["host"],
            "metrics": [{"name": "visited_sum", "type": "long"},
                        {"name": "unique_hosts", "type": "hyperUnique"}]}
    a = load(spark, root1, spec, interval="1970-01-01/3000-01-01",
             data_source="testds").collect()
    b = load(spark, root2, spec, interval="1970-01-01/3000-01-01",
             data_source="testds").collect()
    key = lambda r: (r["__time"], tuple(r["host"]))  # noqa: E731
    a, b = sorted(a, key=key), sorted(b, key=key)
    assert len(a) == len(b) == 3
    for ra, rb in zip(a, b):
        assert ra["__time"] == rb["__time"]
        assert list(ra["host"]) == list(rb["host"])
        assert ra["visited_sum"] == rb["visited_sum"]
        assert bytes(ra["unique_hosts"]) == bytes(rb["unique_hosts"])
    # per-row estimates survive bit-exactly (the reference's own printed
    # value, DruidStorageTest.java:50-52) and so does the merge
    assert druid_hll_estimate_bytes(bytes(b[0]["unique_hosts"])) \
        == pytest.approx(1.0002442201269182, rel=1e-12)
    from druid_hadoop_utils_spark.sources.druid_segment import (
        druid_hll_merge_bytes,
    )

    est_a = druid_hll_estimate_bytes(
        druid_hll_merge_bytes([bytes(r["unique_hosts"]) for r in a]))
    est_b = druid_hll_estimate_bytes(
        druid_hll_merge_bytes([bytes(r["unique_hosts"]) for r in b]))
    assert est_a == est_b


def test_lz4_compressor_roundtrips():
    import random

    from druid_hadoop_utils_spark.sources.druid_segment import (
        lz4_block_decompress,
    )
    from druid_hadoop_utils_spark.sources.druid_segment_export import (
        lz4_block_compress,
    )

    rng = random.Random(7)
    cases = [
        b"",
        b"a",
        b"abcd" * 1,
        b"x" * 100000,                         # long run
        bytes(rng.randrange(256) for _ in range(5000)),   # incompressible
        b"".join(bytes([i % 7]) * (i % 13 + 1) for i in range(3000)),
        struct.pack("<5000q", *range(5000)),   # the actual column shape
    ]
    for src in cases:
        packed = lz4_block_compress(src)
        assert lz4_block_decompress(packed, len(src)) == src


@pytest.mark.parametrize("compression", ["lz4", "uncompressed"])
def test_compression_modes_roundtrip(tmp_path, compression):
    n = 50000
    cols = {
        "__time": {"kind": "LONG", "values": list(range(n))},
        "host": {"kind": "STRING",
                 "values": [f"h{i % 100}" for i in range(n)]},
        "v": {"kind": "FLOAT", "values": [float(i % 97) for i in range(n)]},
    }
    out = write_v9_segment(dict(cols), str(tmp_path / compression), "ds",
                           "1970/1971", "v1", ["host"], ["v"],
                           compression=compression)
    back = read_segment(out)
    assert back["__time"].values == cols["__time"]["values"]
    assert back["host"].values == cols["host"]["values"]
    assert back["v"].values == cols["v"]["values"]


def test_lz4_is_default_and_smaller(tmp_path):
    n = 20000
    cols = {"__time": {"kind": "LONG", "values": list(range(n))},
            "n": {"kind": "LONG", "values": [i % 5 for i in range(n)]}}
    a = write_v9_segment(dict(cols), str(tmp_path / "lz4"), "ds",
                         "1970/1971", "v1", [], ["n"])
    b = write_v9_segment(dict(cols), str(tmp_path / "unc"), "ds",
                         "1970/1971", "v1", [], ["n"],
                         compression="uncompressed")
    import os as _os

    assert _os.path.getsize(f"{a}/index.zip") < _os.path.getsize(
        f"{b}/index.zip") * 0.9


def test_subsecond_time_export_exact(spark, tmp_path):
    """Review r7: float epoch math truncated some sub-second timestamps
    1 ms low — export must use integer millis."""
    from datetime import datetime

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.sources.segments import write_segment

    root = str(tmp_path / "root")
    ts = [datetime(1987, 5, 28, 6, 25, 46, 489000),  # the fuzzed repro
          datetime(1987, 5, 28, 6, 25, 46, 490000),
          datetime(1987, 5, 28, 6, 25, 47, 1000)]
    df = spark.createDataFrame([Row(__time=t, host=["a"], n=1) for t in ts])
    write_segment(df, root, "ev", "1987-05-28/1987-05-29", "v1")
    dirs = export_druid_segments(spark, root, "ev", str(tmp_path / "out"))
    back = read_segment(dirs[0])
    import calendar

    want = sorted(calendar.timegm(t.timetuple()) * 1000
                  + t.microsecond // 1000 for t in ts)
    assert sorted(back["__time"].values) == want
    assert want[0] % 1000 == 489


def test_sharded_export_shardspec(spark, tmp_path):
    """Review r7: every shard of a sharded group must export a numbered
    shardSpec with the group's partition count — 'none' would declare
    shard 0 the complete segment."""
    from datetime import datetime

    from pyspark.sql import Row

    from druid_hadoop_utils_spark.sources.ingest import publish_segments

    root = str(tmp_path / "root")
    rows = [Row(ts=datetime(2024, 1, 1, h), host=["h"], n=h)
            for h in range(8)]
    publish_segments(spark.createDataFrame(rows), root, "ev", version="v1",
                     time_column="ts", bucket="DAY", shards_per_bucket=2)
    dirs = export_druid_segments(spark, root, "ev", str(tmp_path / "out"))
    assert len(dirs) == 2
    specs = sorted(
        (json.load(open(f"{d}/descriptor.json"))["shardSpec"]["partitionNum"],
         json.load(open(f"{d}/descriptor.json"))["shardSpec"])
        for d in dirs)
    for num, spec in specs:
        assert spec["type"] == "numbered"
        assert spec["partitions"] == 2
    assert [n for n, _s in specs] == [0, 1]
