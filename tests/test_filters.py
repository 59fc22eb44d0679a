"""DimFilter grammar tests, including the multi-value any-match semantics the
reference leaves untested (SURVEY.md §5)."""

import pytest
from pyspark.sql import Row

from druid_hadoop_utils_spark.functions.filters import filter_to_column


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        Row(id=1, host="a.example.com", tags=["x", "y"], n="10"),
        Row(id=2, host="b.example.com", tags=["y"], n="25"),
        Row(id=3, host="c.example.com", tags=[], n="100"),
        Row(id=4, host=None, tags=None, n=None),
        Row(id=5, host="A.EXAMPLE.COM", tags=["z"], n="3"),
    ]
    return spark.createDataFrame(rows)


def ids(df, flt):
    got = df.where(filter_to_column(flt, df.schema)).select("id").collect()
    return sorted(r.id for r in got)


def test_selector(df):
    assert ids(df, {"type": "selector", "dimension": "host", "value": "a.example.com"}) == [1]


def test_selector_null_matches_missing(df):
    assert ids(df, {"type": "selector", "dimension": "host", "value": None}) == [4]


def test_selector_on_multivalue_any_match(df):
    assert ids(df, {"type": "selector", "dimension": "tags", "value": "y"}) == [1, 2]


def test_selector_null_on_multivalue_matches_empty(df):
    assert ids(df, {"type": "selector", "dimension": "tags", "value": None}) == [3, 4]


def test_in(df):
    flt = {"type": "in", "dimension": "host", "values": ["a.example.com", "c.example.com"]}
    assert ids(df, flt) == [1, 3]


def test_in_with_null_value(df):
    flt = {"type": "in", "dimension": "host", "values": ["a.example.com", None]}
    assert ids(df, flt) == [1, 4]


def test_in_on_multivalue(df):
    flt = {"type": "in", "dimension": "tags", "values": ["x", "z"]}
    assert ids(df, flt) == [1, 5]


def test_bound_lexicographic(df):
    flt = {"type": "bound", "dimension": "host", "lower": "a", "upper": "b.zzz"}
    assert ids(df, flt) == [1, 2]


def test_bound_numeric(df):
    flt = {"type": "bound", "dimension": "n", "lower": "10", "upper": "100",
           "upperStrict": True, "alphaNumeric": True}
    assert ids(df, flt) == [1, 2]


def test_bound_numeric_ordering_key(df):
    flt = {"type": "bound", "dimension": "n", "lower": "25", "ordering": "numeric"}
    assert ids(df, flt) == [2, 3]


def test_regex_is_find_not_full_match(df):
    # Druid RegexDimFilter uses find() semantics → unanchored, like rlike
    assert ids(df, {"type": "regex", "dimension": "host", "pattern": "example"}) == [1, 2, 3]


def test_search_contains_case_sensitive(df):
    flt = {"type": "search", "dimension": "host",
           "query": {"type": "contains", "value": "a.example", "caseSensitive": True}}
    assert ids(df, flt) == [1]


def test_search_contains_defaults_case_insensitive(df):
    # Druid 0.9's ContainsSearchQuerySpec deserializes a missing
    # caseSensitive as false (Jackson primitive boolean)
    flt = {"type": "search", "dimension": "host",
           "query": {"type": "contains", "value": "a.example"}}
    assert ids(df, flt) == ids(
        df, {"type": "search", "dimension": "host",
             "query": {"type": "insensitive_contains", "value": "a.example"}})


def test_search_insensitive_contains(df):
    flt = {"type": "search", "dimension": "host",
           "query": {"type": "insensitive_contains", "value": "a.example"}}
    assert ids(df, flt) == [1, 5]


def test_search_fragment(df):
    flt = {"type": "search", "dimension": "host",
           "query": {"type": "fragment", "values": ["example", "b."]}}
    assert ids(df, flt) == [2]


def test_like(df):
    assert ids(df, {"type": "like", "dimension": "host", "pattern": "%.example.com"}) == [1, 2, 3]


def test_and_or_not(df):
    flt = {
        "type": "and",
        "fields": [
            {"type": "or", "fields": [
                {"type": "selector", "dimension": "host", "value": "a.example.com"},
                {"type": "selector", "dimension": "host", "value": "b.example.com"},
            ]},
            {"type": "not", "field": {"type": "selector", "dimension": "host",
                                      "value": "b.example.com"}},
        ],
    }
    assert ids(df, flt) == [1]


def test_not_matches_null_rows(df):
    # NOT(selector=x) must also match rows where the dim is missing
    flt = {"type": "not", "field": {"type": "selector", "dimension": "host",
                                    "value": "a.example.com"}}
    assert ids(df, flt) == [2, 3, 4, 5]


def test_bound_on_multivalue_any_match(df):
    flt = {"type": "bound", "dimension": "tags", "lower": "y"}
    assert ids(df, flt) == [1, 2, 5]


def test_javascript_rejected(df):
    with pytest.raises(NotImplementedError):
        filter_to_column({"type": "javascript", "dimension": "host", "function": "f"}, df.schema)


def test_unknown_type_rejected(df):
    with pytest.raises(ValueError):
        filter_to_column({"type": "mystery", "dimension": "host"}, df.schema)


class TestNumericColumnLiteralEdges:
    """ANSI-mode edges surfaced by the pruning soundness property sweep:
    selector/in literals that don't parse as the column's numeric type
    must match NOTHING (Druid coercion), never CAST_INVALID_INPUT."""

    def _df(self, spark):
        return spark.createDataFrame(
            [(1, 10), (2, 50), (3, None)], "id long, uid long")

    def test_selector_empty_string_on_numeric_matches_null_rows(self, spark):
        from druid_hadoop_utils_spark.functions.filters import filter_to_column

        df = self._df(spark)
        out = df.where(filter_to_column(
            {"type": "selector", "dimension": "uid", "value": ""}, df.schema))
        assert [r.id for r in out.collect()] == [3]

    def test_selector_unparseable_on_numeric_matches_nothing(self, spark):
        from druid_hadoop_utils_spark.functions.filters import filter_to_column

        df = self._df(spark)
        out = df.where(filter_to_column(
            {"type": "selector", "dimension": "uid", "value": "abc"}, df.schema))
        assert out.count() == 0

    def test_selector_zero_padded_numeric_coerces(self, spark):
        from druid_hadoop_utils_spark.functions.filters import filter_to_column

        df = self._df(spark)
        out = df.where(filter_to_column(
            {"type": "selector", "dimension": "uid", "value": "050"}, df.schema))
        assert [r.id for r in out.collect()] == [2]

    def test_in_mixed_parseable_and_garbage_on_numeric(self, spark):
        from druid_hadoop_utils_spark.functions.filters import filter_to_column

        df = self._df(spark)
        out = df.where(filter_to_column(
            {"type": "in", "dimension": "uid",
             "values": ["10", "zzz", ""]}, df.schema))
        # 10 matches, zzz matches nothing, "" matches the NULL row
        assert sorted(r.id for r in out.collect()) == [1, 3]


class TestBoundAndArrayAnsiEdges:
    """Second review sweep: bound + array paths get the same ANSI-safe
    Druid literal semantics as scalar selector/in."""

    def test_lexicographic_bound_on_numeric_column(self, spark):
        from druid_hadoop_utils_spark.functions.filters import filter_to_column

        df = spark.createDataFrame(
            [(1, 100), (2, 50), (3, 9)], "id long, uid long")
        # Druid default ordering is lexicographic over STRING renderings:
        # "100" < "50" < "9"
        out = df.where(filter_to_column(
            {"type": "bound", "dimension": "uid", "lower": "50"}, df.schema))
        assert sorted(r.id for r in out.collect()) == [2, 3]
        # an unparseable bound must not crash: digits sort below letters,
        # so lower="abc" matches nothing
        out2 = df.where(filter_to_column(
            {"type": "bound", "dimension": "uid", "lower": "abc"}, df.schema))
        assert out2.count() == 0

    def test_selector_garbage_on_numeric_array(self, spark):
        from druid_hadoop_utils_spark.functions.filters import filter_to_column

        df = spark.createDataFrame([(1, [10, 20]), (2, [30])],
                                   "id long, ids array<bigint>")
        out = df.where(filter_to_column(
            {"type": "selector", "dimension": "ids", "value": "abc"},
            df.schema))
        assert out.count() == 0
        ok = df.where(filter_to_column(
            {"type": "selector", "dimension": "ids", "value": "30"},
            df.schema))
        assert [r.id for r in ok.collect()] == [2]

    def test_in_garbage_on_numeric_array(self, spark):
        from druid_hadoop_utils_spark.functions.filters import filter_to_column

        df = spark.createDataFrame([(1, [10, 20]), (2, [30])],
                                   "id long, ids array<bigint>")
        out = df.where(filter_to_column(
            {"type": "in", "dimension": "ids", "values": ["zzz", "20"]},
            df.schema))
        assert [r.id for r in out.collect()] == [1]
