"""DimFilter JSON tree → Catalyst ``Column`` predicate (SURVEY.md §2.2 P3).

Implements the Druid 0.9.1 DimFilter grammar the reference wires through its
ingestion spec (reference: PigSegmentLoadSpec.java:20,31,43 — the ``filter``
field is an ``io.druid.query.filter.DimFilter`` evaluated during segment
read): ``selector``, ``in``, ``bound``, ``regex``, ``search``, ``like``, and
the combinators ``and`` / ``or`` / ``not``.

Multi-value dimension semantics: a filter matches a row if ANY of the
dimension's values matches (Druid behavior; untested in the reference —
SURVEY.md §5 "what's NOT tested" — so pinned by our own tests). For
``ArrayType`` columns the predicate becomes ``array_contains`` /
``arrays_overlap`` / ``exists`` accordingly.

Null handling: Druid treats null and empty string as the same "missing"
value; a selector with a null/empty value matches missing dimensions.

Everything here emits built-in Catalyst expressions, so simple predicates
(selector/in/bound on scalar columns) push down to Parquet row-group stats
automatically — the Spark-era analogue of the reference's bitmap-index
filtering (SURVEY.md §4 O4).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, NumericType, StructType


def _is_array(schema: StructType | None, name: str) -> bool:
    if schema is None:
        return False
    try:
        return isinstance(schema[name].dataType, ArrayType)
    except KeyError:
        return False


def _any_value(col: Column, pred) -> Column:
    """ANY-value match over a multi-value dimension."""
    return F.coalesce(F.exists(col, pred), F.lit(False))


def _is_numeric(schema: StructType | None, name: str) -> bool:
    if schema is None:
        return False
    try:
        return isinstance(schema[name].dataType, NumericType)
    except KeyError:
        return False


def _parse_number(value: str):
    """Druid-style literal coercion for numeric-column equality: int if
    it parses, else float, else None (matches nothing)."""
    try:
        return int(value)
    except (TypeError, ValueError):
        try:
            return float(value)
        except (TypeError, ValueError):
            return None


def _null_or_empty(col: Column, is_array: bool, is_numeric: bool = False) -> Column:
    if is_array:
        return col.isNull() | (F.size(col) == 0)
    if is_numeric:
        # '' has no numeric rendering: only NULL rows match (comparing a
        # numeric column to '' would throw CAST_INVALID_INPUT under ANSI)
        return col.isNull()
    return col.isNull() | (col == F.lit(""))


_CHUNK_SPLIT = r"(?<=[0-9])(?=[^0-9])|(?<=[^0-9])(?=[0-9])"


def _alphanum_chunks(s: str) -> list[str]:
    return re.findall(r"[0-9]+|[^0-9]+", s)


def _strip_zeros(s: str) -> str:
    return s.lstrip("0") or "0"


def _natural_cmp(col: Column, bound: str) -> tuple[Column, Column]:
    """(col < bound, col > bound) under Druid 0.9's alphanumeric comparator
    (StringComparators.ALPHANUMERIC): strings split into digit / non-digit
    chunks; two digit chunks compare as nonnegative integers, any other
    chunk pair compares lexicographically; a string that runs out of chunks
    first is smaller.

    The bound is a plan-time literal, so its chunking happens in Python and
    the runtime side is one ``split`` plus an O(#bound-chunks) expression —
    no UDF. Digit-chunk numeric comparison uses (zero-stripped length,
    lexicographic) tuple order, which equals integer order at arbitrary
    precision without any overflow-prone cast.
    """
    toks = F.split(col, _CHUNK_SPLIT)
    kchunks = _alphanum_chunks(bound)
    if not kchunks:  # empty bound: anything non-empty is greater
        return F.lit(False), col != F.lit("")

    digits = "^[0-9]+$"
    lt = F.lit(False)  # all bound chunks matched equally...
    gt = F.size(toks) > len(kchunks)  # ...col bigger only via extra chunks
    for i in reversed(range(len(kchunks))):
        # try_element_at: out-of-bounds → null (ANSI element_at throws)
        t = F.try_element_at(toks, F.lit(i + 1))
        kc = kchunks[i]
        if kc.isdigit():
            kn = _strip_zeros(kc)
            ts = F.regexp_replace(t, "^0+", "")
            ts = F.when(ts == "", F.lit("0")).otherwise(ts)
            both = t.rlike(digits)
            c_lt = F.when(
                both,
                (F.length(ts) < len(kn)) | ((F.length(ts) == len(kn)) & (ts < kn)),
            ).otherwise(t < F.lit(kc))
            c_gt = F.when(
                both,
                (F.length(ts) > len(kn)) | ((F.length(ts) == len(kn)) & (ts > kn)),
            ).otherwise(t > F.lit(kc))
        else:
            c_lt, c_gt = t < F.lit(kc), t > F.lit(kc)
        # a missing chunk at i means col is a strict prefix of the bound
        lt = F.when(t.isNull(), F.lit(True)).otherwise(
            F.when(c_lt, F.lit(True)).when(c_gt, F.lit(False)).otherwise(lt)
        )
        gt = F.when(t.isNull(), F.lit(False)).otherwise(
            F.when(c_gt, F.lit(True)).when(c_lt, F.lit(False)).otherwise(gt)
        )
    # Spark splits "" into [""] (one empty token) — force the prefix rule
    lt = F.when(col == F.lit(""), F.lit(True)).otherwise(lt)
    gt = F.when(col == F.lit(""), F.lit(False)).otherwise(gt)
    return lt, gt


def _search_query_pred(q: dict):
    """Druid 0.9 SearchQuerySpec → per-value boolean predicate builder
    (shared by the ``search`` filter and the ``searchQuery`` extractionFn)."""
    qtype = q.get("type", "contains")
    if qtype == "fragment":
        values = q.get("values", [])
        case_sensitive = bool(q.get("caseSensitive"))

        def frag(v: Column) -> Column:
            pred = F.lit(True)
            for needle in values:
                if case_sensitive:
                    pred = pred & v.contains(needle)
                else:
                    pred = pred & F.lower(v).contains(needle.lower())
            return pred

        return frag
    value = q.get("value", "")
    # Druid 0.9 deserializes a missing caseSensitive as false (Jackson
    # primitive boolean), so a bare {"type":"contains"} is insensitive
    case_sensitive = qtype == "contains" and bool(q.get("caseSensitive", False))
    if qtype == "insensitive_contains":
        case_sensitive = False

    def contains(v: Column) -> Column:
        if case_sensitive:
            return v.contains(value)
        return F.lower(v).contains(value.lower())

    return contains


# Joda-Time pattern letters that mean the same thing to java.time's
# DateTimeFormatter (what Spark's date_format/to_timestamp use). Anything
# outside this set is rejected loudly instead of silently reformatting
# differently than Druid would have.
_SAFE_TIME_PATTERN_LETTERS = set("yMdHhmsSEaDKkwZXx")


def _check_time_pattern(pattern: str) -> str:
    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "'":  # quoted literal — skip to closing quote
            j = pattern.find("'", i + 1)
            if j < 0:
                raise ValueError(f"unterminated quote in time pattern: {pattern!r}")
            i = j + 1
            continue
        if c.isalpha() and c not in _SAFE_TIME_PATTERN_LETTERS:
            raise NotImplementedError(
                f"time pattern letter {c!r} in {pattern!r} is not in the "
                "Joda/java.time-compatible subset"
            )
        i += 1
    return pattern


def _extraction_fn(fn: dict, col: Column) -> Column:
    """Druid extractionFn grammar (the subset with Spark-native mappings):
    substring, regex (capture group 1), partial, searchQuery, timeFormat,
    time, lower, upper, strlen, cascade, stringFormat,
    lookup/registeredLookup. javascript is rejected."""
    ftype = fn.get("type")
    if ftype == "cascade":
        # Druid CascadeExtractionFn: apply each listed extractionFn in order
        for sub in fn.get("extractionFns", []):
            col = _extraction_fn(sub, col)
        return col
    if ftype == "stringFormat":
        # Druid StringFormatExtractionFn: java String.format with the value
        # as the single %s argument. 0.9.1 formatted null as the literal
        # "null" (Java Formatter behavior) = later Druid's NULLSTRING mode;
        # EMPTYSTRING / RETURNNULL match the post-0.10 nullHandling knob.
        fmt = fn["format"]
        if fmt.count("%") != 1 or "%s" not in fmt:
            raise NotImplementedError(
                f"stringFormat format {fmt!r}: only a single %s is supported"
            )
        null_mode = fn.get("nullHandling", "NULLSTRING")
        if null_mode == "NULLSTRING":
            return F.format_string(fmt, F.coalesce(col, F.lit("null")))
        if null_mode == "EMPTYSTRING":
            return F.format_string(fmt, F.coalesce(col, F.lit("")))
        if null_mode == "RETURNNULL":
            return F.when(col.isNotNull(), F.format_string(fmt, col))
        raise ValueError(f"unknown stringFormat nullHandling: {null_mode!r}")
    if ftype == "substring":
        index = int(fn.get("index", 0))
        length = fn.get("length")
        return F.substring(col, index + 1, int(length) if length is not None else 2**31 - 1)
    if ftype == "regex":
        return F.regexp_extract(col, fn["expr"], 1)
    if ftype == "partial":
        # Druid MatchingDimExtractionFn: keep the value when it matches the
        # regex, else null (rows with null extraction drop out of groupBys)
        return F.when(col.rlike(fn["expr"]), col)
    if ftype == "searchQuery":
        # Druid SearchQuerySpecDimExtractionFn: keep the value when it
        # matches the SearchQuerySpec, else null
        q = fn.get("query", {})
        return F.when(_search_query_pred(q)(col), col)
    if ftype == "timeFormat":
        # Druid TimeFormatExtractionFn over __time: format the timestamp
        # with a Joda pattern (java.time-compatible subset) in an optional
        # timeZone. Null/absent format = ISO8601 (Druid default).
        tz = fn.get("timeZone")
        locale = fn.get("locale")
        if locale not in (None, "en", "en-US", "en_US"):
            raise NotImplementedError(
                f"timeFormat locale {locale!r} is not supported (en only)"
            )
        ts = F.from_utc_timestamp(col, tz) if tz else col
        pattern = fn.get("format")
        if pattern is None:
            return F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        return F.date_format(ts, _check_time_pattern(pattern))
    if ftype == "time":
        # Druid TimeDimExtractionFn: parse a STRING dimension with
        # timeFormat, re-format with resultFormat (e.g. MM/dd/yyyy → yyyy-MM)
        parsed = F.to_timestamp(col, _check_time_pattern(fn["timeFormat"]))
        return F.date_format(parsed, _check_time_pattern(fn["resultFormat"]))
    if ftype == "lower":
        return F.lower(col)
    if ftype == "upper":
        return F.upper(col)
    if ftype == "strlen":
        return F.length(col).cast("string")
    if ftype == "lookup":
        # inline map lookup (Druid MapLookupExtractor): the map ships as a
        # literal expression; retainMissingValue keeps unmapped values,
        # otherwise they become replaceMissingValueWith (default null)
        from druid_hadoop_utils_spark.functions.lookups import (
            apply_missing_policy,
            lookup_expr,
        )

        lookup = fn.get("lookup", {})
        if lookup.get("type") != "map":
            raise NotImplementedError("only inline map lookups are supported")
        mapped = lookup_expr(lookup.get("map", {}), col)
        return apply_missing_policy(mapped, col, fn)
    if ftype == "registeredLookup":
        # named lookup resolved from the process-local registry (Druid's
        # cluster-distributed lookup module); same missing-value policy as
        # the inline form. Large registered tables → lookups.lookup_join.
        from druid_hadoop_utils_spark.functions.lookups import (
            apply_missing_policy,
            lookup_expr,
            lookup_mapping,
        )

        mapped = lookup_expr(lookup_mapping(fn["lookup"]), col)
        return apply_missing_policy(mapped, col, fn)
    if ftype == "javascript":
        raise NotImplementedError(f"extractionFn {ftype!r} is not supported")
    raise ValueError(f"unknown extractionFn: {fn!r}")


def filter_to_column(spec: dict | None, schema: StructType | DataFrame | None = None) -> Column:
    """Translate a DimFilter JSON tree into a boolean Column."""
    if isinstance(schema, DataFrame):
        schema = schema.schema
    if spec is None:
        return F.lit(True)
    ftype = spec.get("type")
    if ftype is None:
        raise ValueError(f"filter missing 'type': {spec!r}")

    if ftype == "and":
        cols = [filter_to_column(f, schema) for f in spec["fields"]]
        out = cols[0]
        for c in cols[1:]:
            out = out & c
        return out
    if ftype == "or":
        cols = [filter_to_column(f, schema) for f in spec["fields"]]
        out = cols[0]
        for c in cols[1:]:
            out = out | c
        return out
    if ftype == "not":
        inner = filter_to_column(spec["field"], schema)
        # Druid's NOT matches rows where the inner filter does not match,
        # including rows where the inner predicate is NULL (missing dim).
        return ~F.coalesce(inner, F.lit(False))

    dim = spec.get("dimension")
    if dim is None:
        raise ValueError(f"filter missing 'dimension': {spec!r}")
    col = F.col(dim)
    arr = _is_array(schema, dim)
    num = _is_numeric(schema, dim)
    if arr and schema is not None:
        # numeric ELEMENT type: literals need the same plan-time coercion
        # as scalar numeric columns (array_contains with an unparseable
        # string would CAST_INVALID_INPUT under ANSI)
        try:
            num = isinstance(schema[dim].dataType.elementType, NumericType)
        except KeyError:
            pass

    if ftype == "selector":
        value = spec.get("value")
        if value is None or value == "":
            return _null_or_empty(col, arr, num)
        if num and isinstance(value, str):
            # parse the literal at PLAN time: Druid coerces the value to
            # the column type, and an unparseable value matches nothing —
            # comparing the raw string would CAST_INVALID_INPUT under ANSI
            value = _parse_number(value)
            if value is None:
                return F.lit(False)
        if arr:
            return F.coalesce(F.array_contains(col, F.lit(value)), F.lit(False))
        return col == F.lit(value)

    if ftype == "in":
        values = [v for v in spec.get("values", [])]
        non_null = [v for v in values if v not in (None, "")]
        has_null = len(non_null) != len(values)
        if num:
            non_null = [p for v in non_null
                        if (p := _parse_number(v) if isinstance(v, str) else v)
                        is not None]
        if arr:
            pred = F.coalesce(
                F.arrays_overlap(col, F.array(*[F.lit(v) for v in non_null])), F.lit(False)
            ) if non_null else F.lit(False)
        else:
            pred = col.isin(non_null) if non_null else F.lit(False)
            pred = F.coalesce(pred, F.lit(False))
        if has_null:
            pred = pred | _null_or_empty(col, arr, num)
        return pred

    if ftype == "bound":
        # Three orderings:
        # - plain: lexicographic (Druid default)
        # - "ordering": "numeric" (engine extension) or alphaNumeric on a
        #   NUMERIC column: compare as doubles — for a genuinely numeric
        #   column this equals Druid's alphanumeric chunk order (nonneg
        #   values), and the plain comparison pushes down to parquet stats
        # - alphaNumeric on a STRING column: Druid 0.9's chunked
        #   natural-sort comparator (digit runs numeric, e.g. "a9" < "a10")
        col_numeric = False
        if schema is not None:
            try:
                dt = schema[dim].dataType
                col_numeric = isinstance(
                    dt.elementType if isinstance(dt, ArrayType) else dt, NumericType
                )
            except KeyError:
                pass
        alpha = bool(spec.get("alphaNumeric")) or spec.get("ordering") == "alphanumeric"
        numeric = spec.get("ordering") == "numeric" or (alpha and col_numeric)
        natural = alpha and not numeric

        def one(v: Column) -> Column:
            # try_cast: under ANSI mode a plain cast THROWS on non-numeric
            # strings; Druid's numeric bound simply doesn't match such rows.
            # The isNotNull base also keeps a boundless bound filter from
            # matching missing/uncastable values.
            if numeric:
                target = v.try_cast("double")
            elif col_numeric and not natural:
                # Druid's DEFAULT bound ordering is lexicographic over the
                # dimension's STRING values even for numeric columns —
                # compare renderings (also ANSI-safe for bounds like
                # "abc" that a numeric-literal comparison would throw on)
                target = v.cast("string")
            else:
                target = v
            pred = target.isNotNull()
            if spec.get("lower") is not None:
                if natural:
                    lt, gt = _natural_cmp(v.cast("string"), str(spec["lower"]))
                    pred = pred & (gt if spec.get("lowerStrict") else ~lt)
                else:
                    lo = F.lit(float(spec["lower"])) if numeric else F.lit(spec["lower"])
                    pred = pred & (target > lo if spec.get("lowerStrict") else target >= lo)
            if spec.get("upper") is not None:
                if natural:
                    lt, gt = _natural_cmp(v.cast("string"), str(spec["upper"]))
                    pred = pred & (lt if spec.get("upperStrict") else ~gt)
                else:
                    hi = F.lit(float(spec["upper"])) if numeric else F.lit(spec["upper"])
                    pred = pred & (target < hi if spec.get("upperStrict") else target <= hi)
            return pred

        if arr:
            return _any_value(col, one)
        return one(col)

    if ftype == "regex":
        pattern = spec["pattern"]
        if arr:
            return _any_value(col, lambda v: v.rlike(pattern))
        return col.rlike(pattern)

    if ftype == "search":
        pred = _search_query_pred(spec.get("query", {}))
        return _any_value(col, pred) if arr else pred(col)

    if ftype == "like":
        pattern = spec["pattern"]
        if arr:
            return _any_value(col, lambda v: v.like(pattern))
        return col.like(pattern)

    if ftype == "extraction":
        # Druid 0.9.1 extraction filter: apply an extractionFn to the
        # dimension, compare the result to `value`
        fn = spec.get("extractionFn", {})
        value = spec.get("value")

        def extracted(v: Column) -> Column:
            return _extraction_fn(fn, v)

        if arr:
            return _any_value(col, lambda v: extracted(v) == F.lit(value))
        return extracted(col) == F.lit(value)

    if ftype == "javascript":
        raise NotImplementedError(
            "javascript DimFilter is not supported; rewrite as and/or/not over "
            "selector/in/bound/regex/search (reference allowed it via Rhino, "
            "SURVEY.md §2.2 P3 — deliberately excluded as a non-scalable path)"
        )
    raise ValueError(f"unknown DimFilter type: {ftype!r}")
