from datetime import datetime, timezone

import pytest

from druid_hadoop_utils_spark.intervals import Interval, merge_adjacent, parse_ts


def ts(s):
    return parse_ts(s)


def test_parse_interval_zulu():
    iv = Interval.parse("2014-10-22T00:00:00.000Z/2014-10-23T00:00:00.000Z")
    assert iv.start == datetime(2014, 10, 22, tzinfo=timezone.utc)
    assert iv.end == datetime(2014, 10, 23, tzinfo=timezone.utc)


def test_parse_interval_date_only():
    iv = Interval.parse("1970-01-01/3000-01-01")
    assert iv.start.year == 1970 and iv.end.year == 3000


def test_half_open_semantics():
    iv = Interval.parse("2014-10-22/2014-10-23")
    assert iv.contains_point(ts("2014-10-22T00:00:00Z"))
    assert iv.contains_point(ts("2014-10-22T23:59:59Z"))
    assert not iv.contains_point(ts("2014-10-23T00:00:00Z"))


def test_empty_interval_rejected():
    with pytest.raises(ValueError):
        Interval.parse("2014-10-23/2014-10-22")


def test_intersect_and_overlap():
    a = Interval.parse("2014-10-22/2014-10-24")
    b = Interval.parse("2014-10-23/2014-10-25")
    c = Interval.parse("2014-10-24/2014-10-25")
    assert a.overlaps(b)
    assert not a.overlaps(c)  # half-open: touching endpoints don't overlap
    assert a.intersect(b) == Interval.parse("2014-10-23/2014-10-24")
    assert a.intersect(c) is None


def test_merge_adjacent():
    parts = [
        Interval.parse("2014-10-23/2014-10-24"),
        Interval.parse("2014-10-22/2014-10-23"),
        Interval.parse("2014-10-26/2014-10-27"),
    ]
    merged = merge_adjacent(parts)
    assert merged == [
        Interval.parse("2014-10-22/2014-10-24"),
        Interval.parse("2014-10-26/2014-10-27"),
    ]
