"""Named lookups: registeredLookup extractionFn + broadcast lookup_join."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.functions import lookups as LK
from druid_hadoop_utils_spark.functions.filters import filter_to_column


@pytest.fixture(autouse=True)
def clean_registry():
    LK.clear_lookups()
    yield
    LK.clear_lookups()


@pytest.fixture
def df(spark):
    return spark.createDataFrame(
        [Row(d="a"), Row(d="b"), Row(d="c"), Row(d=None)]
    )


def test_registered_lookup_extraction_filter(spark, df):
    LK.register_lookup("m", {"a": "x", "b": "y"})
    spec = {"type": "extraction", "dimension": "d", "value": "x",
            "extractionFn": {"type": "registeredLookup", "lookup": "m"}}
    got = [r.d for r in df.where(filter_to_column(spec, df.schema)).collect()]
    assert got == ["a"]


def test_registered_lookup_retain_missing(spark, df):
    LK.register_lookup("m", {"a": "x"})
    spec = {"type": "extraction", "dimension": "d", "value": "c",
            "extractionFn": {"type": "registeredLookup", "lookup": "m",
                             "retainMissingValue": True}}
    got = [r.d for r in df.where(filter_to_column(spec, df.schema)).collect()]
    assert got == ["c"]  # unmapped value retained, then matched


def test_unregistered_lookup_raises(df):
    spec = {"type": "extraction", "dimension": "d", "value": "x",
            "extractionFn": {"type": "registeredLookup", "lookup": "nope"}}
    with pytest.raises(KeyError):
        filter_to_column(spec, df.schema)


def test_dataframe_backed_lookup(spark, df):
    lut = spark.createDataFrame([Row(k="a", v="x"), Row(k="b", v="y")])
    LK.register_lookup("m", lut)
    spec = {"type": "extraction", "dimension": "d", "value": "y",
            "extractionFn": {"type": "registeredLookup", "lookup": "m"}}
    got = [r.d for r in df.where(filter_to_column(spec, df.schema)).collect()]
    assert got == ["b"]


def test_large_lookup_uses_single_literal(spark):
    """Above the inline cap the expression compiles via str_to_map — ONE
    string literal in the plan instead of thousands of create_map args —
    and still evaluates correctly."""
    big = {f"k{i}": f"v{i}" for i in range(5000)}
    df = spark.createDataFrame([Row(d="k42"), Row(d="k4999"), Row(d="zz")])
    out = df.select(LK.lookup_expr(big, F.col("d")).alias("v"))
    assert "str_to_map" in out._jdf.queryExecution().analyzed().toString()
    assert [r.v for r in out.collect()] == ["v42", "v4999", None]


def test_lookup_join_broadcast(spark):
    df = spark.createDataFrame([Row(d="a", n=1), Row(d="b", n=2), Row(d="z", n=3)])
    LK.register_lookup("m", {"a": "x", "b": "y"})
    out = LK.lookup_join(df, "d", "m", output="cat", replace_missing="other")
    got = {r.d: r.cat for r in out.collect()}
    assert got == {"a": "x", "b": "y", "z": "other"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_lookup_join_retain_missing(spark):
    df = spark.createDataFrame([Row(d="a"), Row(d="z")])
    out = LK.lookup_join(df, "d", {"a": "x"}, retain_missing=True)
    assert {r.d for r in out.collect()} == {"x", "z"}
