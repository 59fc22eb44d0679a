"""Driver-calling-convention hardening: the battery must produce
oracle-identical results even when invoked from a session configured with
a NON-UTC timezone (the engine pins UTC per query via _prep, matching the
reference's UTC discipline, pom.xml:36-39)."""

import duckdb
import pytest

from druid_hadoop_utils_spark.sources.tables import ALL_TABLES


@pytest.fixture()
def hostile_tz(spark):
    original = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", original)


TZ_SENSITIVE = [
    "q_granularity_hour_rollup",
    "q_granularity_week",
    "q_granularity_day_tz",
    "q_sessionize",
    "q_scan_interval_project",
    "q_timeseries_zero_fill",
    "q_multi_interval",
    # round 6: state-bucket interval filtering (materialized rewrite) and
    # the cache's TIMESTAMP_MICROS-pinned parquet round-trip both lean on
    # the UTC pin — guard them under a hostile session tz too
    "q_api_materialized_require",
    "q_cached_query",
]


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_battery_correct_under_non_utc_session(hostile_tz, sf_dir, name):
    import os

    from druid_hadoop_utils_spark.battery import QUERIES

    fn, sql = QUERIES[name]
    sdf = fn(hostile_tz, sf_dir)

    con = duckdb.connect()
    for t in ALL_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    orows = con.execute(sql).fetchall()
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) == len(orows)

    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted(tuple(str(r[i]) for i in order) for r in rows)

    scols = sdf.columns
    ocols = [d[0] for d in con.execute(sql).description]
    assert norm(srows, scols) == norm(orows, ocols)
