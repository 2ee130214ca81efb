"""Temporal namespace (FIXTURES F9; oracles ExprTests.fs:102-186, DataTypeTests.cs)."""

import datetime as dt

import polars_net_spark as pl
from polars_net_spark import col, lit_datetime


def test_parts(spark):
    t = dt.datetime(2024, 3, 15, 14, 30, 45, 123456)
    df = pl.from_records([(t,)], ["ts"])
    out = df.select(
        col("ts").dt.year().alias("y"),
        col("ts").dt.month().alias("mo"),
        col("ts").dt.day().alias("d"),
        col("ts").dt.ordinal_day().alias("od"),
        col("ts").dt.weekday().alias("wd"),
        col("ts").dt.hour().alias("h"),
        col("ts").dt.minute().alias("mi"),
        col("ts").dt.second().alias("s"),
        col("ts").dt.millisecond().alias("ms"),
        col("ts").dt.microsecond().alias("us"),
    )
    assert out.rows()[0] == (2024, 3, 15, 75, 5, 14, 30, 45, 123, 123456)


def test_truncate_round(spark):
    t = dt.datetime(2024, 1, 1, 10, 38, 0)
    df = pl.from_records([(t,)], ["ts"])
    out = df.select(
        col("ts").dt.truncate("15m").alias("tr"),
        col("ts").dt.round("15m").alias("rd"),
        col("ts").dt.truncate("1h").alias("th"),
    )
    r = out.rows()[0]
    assert r[0] == dt.datetime(2024, 1, 1, 10, 30)
    assert r[1] == dt.datetime(2024, 1, 1, 10, 45)
    assert r[2] == dt.datetime(2024, 1, 1, 10, 0)


def test_offset_by_timestamp_unit(spark):
    t = dt.datetime(2024, 1, 1, 0, 0, 0)
    df = pl.from_records([(t,)], ["ts"])
    out = df.select(
        col("ts").dt.offset_by("1d2h").alias("o"),
        col("ts").dt.timestamp("ms").alias("ms"),
        col("ts").dt.timestamp("us").alias("us"),
    )
    r = out.rows()[0]
    assert r[0] == dt.datetime(2024, 1, 2, 2, 0, 0)
    assert r[1] == 1704067200000
    assert r[2] == 1704067200000000


def test_strftime_to_string(spark):
    t = dt.datetime(2024, 3, 5, 9, 7, 2)
    df = pl.from_records([(t,)], ["ts"])
    out = df.select(
        col("ts").dt.to_string("%Y-%m-%d").alias("d"),
        col("ts").dt.to_string("%d/%m/%Y %H:%M:%S").alias("f"),
        col("ts").dt.to_string("%B %A").alias("n"),
    )
    assert out.rows()[0] == ("2024-03-05", "05/03/2024 09:07:02", "March Tuesday")


def test_lit_datetime(spark):
    df = pl.from_records([(1,)], ["x"])
    out = df.select(lit_datetime(1704067200000000).alias("t"))
    assert out.rows()[0][0] == dt.datetime(2024, 1, 1)


def test_date_and_time_of_day(spark):
    t = dt.datetime(2024, 6, 1, 12, 0, 0, 500000)
    df = pl.from_records([(t,)], ["ts"])
    out = df.select(col("ts").dt.date().alias("d"), col("ts").dt.time().alias("tod"))
    r = out.rows()[0]
    assert r[0] == dt.date(2024, 6, 1)
    assert r[1] == (12 * 3600 + 0.5) * 1_000_000_000


def test_replace_time_zone_policies(spark):
    # 2024-03-10 02:30 does not exist in America/New_York (spring forward)
    bad = dt.datetime(2024, 3, 10, 2, 30)
    df = pl.from_records([(bad,)], ["ts"])
    out = df.select(
        col("ts").dt.replace_time_zone("America/New_York", non_existent="null").alias("t")
    )
    assert out.rows()[0][0] is None
    # 2024-11-03 01:30 is ambiguous (fall back): earliest=EDT(UTC-4), latest=EST(UTC-5)
    amb = dt.datetime(2024, 11, 3, 1, 30)
    df2 = pl.from_records([(amb,)], ["ts"])
    early = df2.select(col("ts").dt.replace_time_zone("America/New_York", ambiguous="earliest").alias("t")).rows()[0][0]
    late = df2.select(col("ts").dt.replace_time_zone("America/New_York", ambiguous="latest").alias("t")).rows()[0][0]
    assert early == dt.datetime(2024, 11, 3, 5, 30)
    assert late == dt.datetime(2024, 11, 3, 6, 30)


class TestMonthBounds:
    def test_month_start_end_keep_time(self, spark):
        import datetime as dt
        import polars_net_spark as pl
        from polars_net_spark import col

        rows = [(1, dt.datetime(2024, 2, 15, 8, 30, 5)), (2, dt.datetime(2024, 2, 1, 0, 0))]
        df = pl.LazyFrame(spark.createDataFrame(rows, "id long, ts timestamp"))
        out = df.select(
            col("id"),
            col("ts").dt.month_start().alias("ms"),
            col("ts").dt.month_end().alias("me"),
        ).sort("id").collect().rows()
        assert out[0][1] == dt.datetime(2024, 2, 1, 8, 30, 5)
        assert out[0][2] == dt.datetime(2024, 2, 29, 8, 30, 5)  # leap year
        assert out[1][1] == dt.datetime(2024, 2, 1, 0, 0)
        assert out[1][2] == dt.datetime(2024, 2, 29, 0, 0)
