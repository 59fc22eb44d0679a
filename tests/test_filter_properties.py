"""Property-based DimFilter semantics: random filter trees must evaluate
identically on Spark (filter_to_column) and a pure-Python reference
evaluator implementing the documented semantics — three-valued logic,
multi-value any-match, null≡'' missing handling, NOT(unknown)=True.

This pins the least-tested area of the reference (SURVEY.md §5: DimFilter
never exercised there) against an independent implementation.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from druid_hadoop_utils_spark.functions.filters import filter_to_column

# fixed dataset: nulls, empties, multi-values, numeric-ish strings
ROWS = [
    {"id": 0, "s": "a", "arr": ["a"], "n": "1"},
    {"id": 1, "s": "b", "arr": ["a", "b"], "n": "10"},
    {"id": 2, "s": "ab", "arr": [], "n": "2"},
    {"id": 3, "s": "", "arr": ["b"], "n": "-3"},
    {"id": 4, "s": None, "arr": None, "n": None},
    {"id": 5, "s": "ba", "arr": ["ab", ""], "n": "x"},
    {"id": 6, "s": "A", "arr": ["a", "a"], "n": "10"},
]

VALUES = ["a", "b", "ab", "ba", "A", "", "1", "10", "x"]

leaf_selector = st.builds(
    lambda d, v: {"type": "selector", "dimension": d, "value": v},
    st.sampled_from(["s", "arr", "n"]), st.sampled_from(VALUES + [None]),
)
leaf_in = st.builds(
    lambda d, vs: {"type": "in", "dimension": d, "values": vs},
    st.sampled_from(["s", "arr", "n"]),
    st.lists(st.sampled_from(VALUES), min_size=0, max_size=3),
)
leaf_bound_lex = st.builds(
    lambda d, lo, hi, ls, us: {
        "type": "bound", "dimension": d,
        **({"lower": lo} if lo is not None else {}),
        **({"upper": hi} if hi is not None else {}),
        "lowerStrict": ls, "upperStrict": us,
    },
    st.sampled_from(["s", "arr"]),
    st.sampled_from(VALUES + [None]), st.sampled_from(VALUES + [None]),
    st.booleans(), st.booleans(),
)
leaf_bound_num = st.builds(
    lambda lo, hi: {"type": "bound", "dimension": "n", "alphaNumeric": True,
                    **({"lower": lo} if lo is not None else {}),
                    **({"upper": hi} if hi is not None else {})},
    st.sampled_from(["-5", "0", "1", "2", "10", None]),
    st.sampled_from(["-5", "0", "1", "2", "10", None]),
)
leaf_search = st.builds(
    lambda d, v, ins: {"type": "search", "dimension": d,
                       "query": {"type": "insensitive_contains" if ins else "contains",
                                 "value": v, "caseSensitive": not ins}},
    st.sampled_from(["s", "arr"]), st.sampled_from(["a", "b", "ab", "A"]),
    st.booleans(),
)
leaves = st.one_of(leaf_selector, leaf_in, leaf_bound_lex, leaf_bound_num, leaf_search)


def trees(depth: int = 2):
    if depth == 0:
        return leaves
    sub = trees(depth - 1)
    return st.one_of(
        leaves,
        st.builds(lambda fs: {"type": "and", "fields": fs}, st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda fs: {"type": "or", "fields": fs}, st.lists(sub, min_size=1, max_size=3)),
        st.builds(lambda f: {"type": "not", "field": f}, sub),
    )


# --- pure-Python reference evaluator (three-valued: True/False/None) ---

def _tri_and(vals):
    if any(v is False for v in vals):
        return False
    if any(v is None for v in vals):
        return None
    return True


def _tri_or(vals):
    if any(v is True for v in vals):
        return True
    if any(v is None for v in vals):
        return None
    return False


def _scalar_pred(spec, v):
    """Predicate on one scalar value; v may be None → None (unknown)."""
    t = spec["type"]
    if t == "selector":
        return None if v is None else v == spec["value"]
    if t == "in":
        non_null = [x for x in spec["values"] if x not in (None, "")]
        return None if v is None else v in non_null
    if t == "bound":
        if v is None:
            return None
        numeric = bool(spec.get("alphaNumeric"))
        if numeric:
            try:
                tv = float(v)
            except ValueError:
                return None  # cast failure → unknown, like Spark
        else:
            tv = v
        ok = True
        if spec.get("lower") is not None:
            lo = float(spec["lower"]) if numeric else spec["lower"]
            ok = ok and (tv > lo if spec.get("lowerStrict") else tv >= lo)
        if spec.get("upper") is not None:
            hi = float(spec["upper"]) if numeric else spec["upper"]
            ok = ok and (tv < hi if spec.get("upperStrict") else tv <= hi)
        return ok
    if t == "search":
        if v is None:
            return None
        q = spec["query"]
        needle, hay = q["value"], v
        if q["type"] == "insensitive_contains" or not q.get("caseSensitive", True):
            return needle.lower() in hay.lower()
        return needle in hay
    raise AssertionError(t)


def py_eval(spec, row):
    t = spec["type"]
    if t == "and":
        return _tri_and([py_eval(f, row) for f in spec["fields"]])
    if t == "or":
        return _tri_or([py_eval(f, row) for f in spec["fields"]])
    if t == "not":
        inner = py_eval(spec["field"], row)
        return not (inner is True)  # ~coalesce(inner, False)

    dim = spec["dimension"]
    v = row[dim]
    is_arr = dim == "arr"

    # missing-value special cases first
    if t == "selector" and spec["value"] in (None, ""):
        if is_arr:
            return v is None or len(v) == 0
        return v is None or v == ""
    if t == "in":
        values = spec["values"]
        has_missing = any(x in (None, "") for x in values)
        base = None
        if is_arr:
            base = _tri_or([_scalar_pred(spec, x) for x in (v or [])]) if v else False
            base = bool(base) if base is not None else False
        else:
            base = _scalar_pred(spec, v)
            base = bool(base) if base is not None else False
        if has_missing:
            miss = (v is None or len(v) == 0) if is_arr else (v is None or v == "")
            return base or miss
        return base

    if is_arr:
        if v is None or len(v) == 0:
            # coalesce(exists/array_contains on null/empty, False)
            return False
        vals = [_scalar_pred(spec, x) for x in v]
        out = _tri_or(vals)
        return False if out is None else out
    return _scalar_pred(spec, v)


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([Row(**r) for r in ROWS])


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(trees())
def test_random_filter_trees_match_reference_semantics(df, flt):
    spark_ids = sorted(
        r.id for r in df.where(filter_to_column(flt, df.schema)).select("id").collect()
    )
    py_ids = sorted(r["id"] for r in ROWS if py_eval(flt, r) is True)
    assert spark_ids == py_ids, f"filter {flt}"
