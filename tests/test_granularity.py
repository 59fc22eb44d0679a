"""Granularity truncation boundaries under UTC (SURVEY.md §2.3 G1, §7.4)."""

from datetime import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from druid_hadoop_utils_spark.functions.granularity import granularity_expr


TS = datetime(2014, 10, 22, 13, 47, 53, 123000)  # Wed 2014-10-22T13:47:53.123


@pytest.fixture(scope="module")
def one(spark):
    return spark.createDataFrame([Row(ts=TS)])


def trunc(one, gran):
    return one.select(granularity_expr(gran, F.col("ts")).alias("t")).first().t


@pytest.mark.parametrize(
    "gran,expected",
    [
        ("NONE", TS),
        ("SECOND", datetime(2014, 10, 22, 13, 47, 53)),
        ("MINUTE", datetime(2014, 10, 22, 13, 47)),
        ("FIVE_MINUTE", datetime(2014, 10, 22, 13, 45)),
        ("TEN_MINUTE", datetime(2014, 10, 22, 13, 40)),
        ("FIFTEEN_MINUTE", datetime(2014, 10, 22, 13, 45)),
        ("THIRTY_MINUTE", datetime(2014, 10, 22, 13, 30)),
        ("HOUR", datetime(2014, 10, 22, 13)),
        ("SIX_HOUR", datetime(2014, 10, 22, 12)),
        ("DAY", datetime(2014, 10, 22)),
        ("WEEK", datetime(2014, 10, 20)),  # ISO Monday
        ("MONTH", datetime(2014, 10, 1)),
        ("QUARTER", datetime(2014, 10, 1)),
        ("YEAR", datetime(2014, 1, 1)),
        ("ALL", datetime(1970, 1, 1)),
    ],
)
def test_named_granularities(one, gran, expected):
    assert trunc(one, gran) == expected


def test_duration_spec(one):
    assert trunc(one, {"type": "duration", "duration": 900000}) == datetime(2014, 10, 22, 13, 45)


def test_period_specs(one):
    assert trunc(one, {"type": "period", "period": "PT15M"}) == datetime(2014, 10, 22, 13, 45)
    assert trunc(one, {"type": "period", "period": "P1D"}) == datetime(2014, 10, 22)
    assert trunc(one, {"type": "period", "period": "P1M"}) == datetime(2014, 10, 1)
    assert trunc(one, {"type": "period", "period": "P1Y"}) == datetime(2014, 1, 1)


def test_unknown_granularity_rejected(one):
    with pytest.raises(ValueError):
        trunc(one, "FORTNIGHT")


def test_duration_with_origin(one):
    # Druid DurationGranularity origin: hour buckets anchored at :30
    g = {"type": "duration", "duration": 3600000,
         "origin": "1970-01-01T00:30:00Z"}
    assert trunc(one, g) == datetime(2014, 10, 22, 13, 30)
    # 13:47 with 15-min buckets anchored at :05 → 13:35..13:50 bucket
    g = {"type": "duration", "duration": 900000,
         "origin": "2000-01-01T00:05:00Z"}
    assert trunc(one, g) == datetime(2014, 10, 22, 13, 35)


def test_period_with_timezone(one):
    # 2014-10-22T13:47 UTC = 06:47 PDT (UTC-7, DST) → LA midnight is
    # 2014-10-22T07:00:00 UTC
    g = {"type": "period", "period": "P1D", "timeZone": "America/Los_Angeles"}
    assert trunc(one, g) == datetime(2014, 10, 22, 7)
    # Kathmandu is UTC+5:45: hour buckets shift by 45 minutes
    g = {"type": "period", "period": "PT1H", "timeZone": "Asia/Kathmandu"}
    assert trunc(one, g) == datetime(2014, 10, 22, 13, 15)


def test_calendar_period_origin_rejected(one):
    with pytest.raises(NotImplementedError):
        trunc(one, {"type": "period", "period": "P1M",
                    "origin": "2000-01-01T00:00:00Z"})
