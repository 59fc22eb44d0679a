from datetime import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.operators.sessions import sessionize


def test_session_gap_boundary_semantics(spark):
    """Events <= gap apart merge — the boundary is inclusive (an event at
    EXACTLY previous+gap still merges); only a strictly larger gap splits."""
    rows = [
        Row(ts=datetime(2024, 1, 1, 0, 0, 0), u=1),
        Row(ts=datetime(2024, 1, 1, 0, 29, 59), u=1),   # merges (< 30m)
        Row(ts=datetime(2024, 1, 1, 0, 59, 59), u=1),   # merges again
        Row(ts=datetime(2024, 1, 1, 1, 29, 59), u=1),   # exactly +30m → merges
        Row(ts=datetime(2024, 1, 1, 5, 0, 0), u=1),     # far later → new
        Row(ts=datetime(2024, 1, 1, 0, 10, 0), u=2),    # other key
    ]
    out = sessionize(spark.createDataFrame(rows), time_column="ts", keys=["u"])
    sess = sorted(
        (r.u, r.session_start, r.n_events) for r in out.collect()
    )
    assert sess == [
        (1, datetime(2024, 1, 1, 0, 0, 0), 4),
        (1, datetime(2024, 1, 1, 5, 0, 0), 1),
        (2, datetime(2024, 1, 1, 0, 10, 0), 1),
    ]


def test_session_end_is_last_plus_gap(spark):
    rows = [Row(ts=datetime(2024, 1, 1, 0, 0, 0), u=1),
            Row(ts=datetime(2024, 1, 1, 0, 10, 0), u=1)]
    out = sessionize(spark.createDataFrame(rows), time_column="ts", keys=["u"],
                     gap="30 minutes").first()
    assert out.session_start == datetime(2024, 1, 1, 0, 0, 0)
    assert out.session_end == datetime(2024, 1, 1, 0, 40, 0)


def test_sessionize_streaming_compatible(spark, tmp_path):
    """The same sessionize() call works on a streaming DataFrame."""
    rows = [Row(ts=datetime(2024, 1, 1, 0, m), u=1) for m in (0, 5, 50)]
    src = str(tmp_path / "in")
    df = spark.createDataFrame(rows)
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    sess = sessionize(stream.withWatermark("ts", "1 hour"), time_column="ts",
                      keys=["u"], gap="30 minutes")
    q = (sess.writeStream.format("memory").queryName("sess_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_out").collect()
    # both sessions' windows close relative to the final watermark
    assert {(r.session_start.minute, r.n_events) for r in got} <= {(0, 2), (50, 1)}


class TestForwardFill:
    def test_fills_and_leading_nulls_stay(self, spark):
        from druid_hadoop_utils_spark.operators.sessions import forward_fill

        rows = [
            Row(k="a", t=1, v=None), Row(k="a", t=2, v=5.0),
            Row(k="a", t=3, v=None), Row(k="a", t=4, v=7.0),
            Row(k="a", t=5, v=None), Row(k="b", t=1, v=None),
        ]
        df = spark.createDataFrame(rows, "k string, t int, v double")
        got = {(r.k, r.t): r.v_ffill for r in
               forward_fill(df, ["k"], "t", ["v"]).collect()}
        assert got == {("a", 1): None, ("a", 2): 5.0, ("a", 3): 5.0,
                       ("a", 4): 7.0, ("a", 5): 7.0, ("b", 1): None}

    def test_multiple_columns_and_tiebreak(self, spark):
        from druid_hadoop_utils_spark.operators.sessions import forward_fill

        rows = [Row(k="a", t=1, i=1, x=None, y=1.0),
                Row(k="a", t=1, i=2, x=2.0, y=None),
                Row(k="a", t=2, i=3, x=None, y=None)]
        df = spark.createDataFrame(rows, "k string, t int, i int, x double, y double")
        out = forward_fill(df, ["k"], ["t", "i"], ["x", "y"])
        r3 = {r.i: r for r in out.collect()}[3]
        assert r3.x_ffill == 2.0 and r3.y_ffill == 1.0

    def test_validation(self, spark):
        import pytest

        from druid_hadoop_utils_spark.operators.sessions import forward_fill

        df = spark.createDataFrame([Row(k="a", t=1, v=1.0)])
        with pytest.raises(ValueError, match="at least one column"):
            forward_fill(df, ["k"], "t", [])
