import pytest

from druid_hadoop_utils_spark.plans.spec import LoadSpec, Metric


SCHEMA_FILE_SHAPE = """
{"granularity":"DAY","dimensions":["host"],
 "metrics":[{"name":"visited_sum","type":"long"},{"name":"unique_hosts","type":"hyperUnique"}]}
"""

MR_SHAPE = """
{"dataSource":"testDataSource",
 "interval":"1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z",
 "granularity":"NONE","dimensions":["host"],"metrics":["visited_sum","unique_hosts"]}
"""


def test_parse_schema_file_shape():
    # reference sample-schema.json:1-8 shape
    spec = LoadSpec.from_json(SCHEMA_FILE_SHAPE, data_source="ds", interval="2014-10-22/2014-10-23")
    assert spec.granularity == "DAY"
    assert spec.dimensions == ["host"]
    assert spec.metrics == [Metric("visited_sum", "long"), Metric("unique_hosts", "hyperUnique")]
    assert spec.metrics[1].is_complex
    assert not spec.metrics[0].is_complex
    assert spec.columns == ["__time", "host", "visited_sum", "unique_hosts"]


def test_parse_mr_shape():
    # reference DruidInputFormatTest.java:74-82 shape (metrics as bare names)
    spec = LoadSpec.from_json(MR_SHAPE)
    assert spec.data_source == "testDataSource"
    assert spec.interval.start.year == 1970
    assert spec.granularity == "NONE"
    assert [m.name for m in spec.metrics] == ["visited_sum", "unique_hosts"]


def test_granularity_defaults_to_none():
    # reference PigSegmentLoadSpec.java:42
    spec = LoadSpec.from_json({"dimensions": ["a"], "metrics": []})
    assert spec.granularity == "NONE"


def test_unknown_granularity_rejected():
    with pytest.raises(ValueError):
        LoadSpec.from_json({"granularity": "FORTNIGHT", "dimensions": [], "metrics": []})


def test_multiple_intervals_accepted_and_condensed():
    # extension over the reference (which enforced exactly one interval,
    # DruidInputFormat.java:87-91): interval lists parse, overlapping /
    # adjacent members merge, and ``interval`` stays the single-interval
    # convenience accessor only
    spec = LoadSpec.from_json(
        {"intervals": ["2014-01-01/2014-01-02", "2014-01-05/2014-01-06"]})
    assert len(spec.intervals) == 2
    assert spec.interval is None

    merged = LoadSpec.from_json(
        {"intervals": ["2014-01-01/2014-01-03", "2014-01-02/2014-01-05"]})
    assert len(merged.intervals) == 1
    assert merged.interval is not None
    assert merged.interval.iso().startswith("2014-01-01")
    assert merged.interval.end.day == 5


def test_complex_metric_classification():
    # reference DruidUtils.java:17-21 isComplex rule
    assert Metric("m", "hyperUnique").is_complex
    assert Metric("m", "complex").is_complex
    assert Metric("m", "thetaSketch").is_complex
    assert not Metric("m", "long").is_complex
    assert not Metric("m", "float").is_complex
    assert not Metric("m", "string").is_complex
