"""TIMESTAMP_NTZ input safety for the full dt namespace.

Polars' Datetime default is tz-naive µs (reference native_shim/src/expr.rs:534);
Spark 4 reads tz-naive parquet timestamps as TIMESTAMP_NTZ, and ``unix_micros``
rejects NTZ input. Every epoch-math dt op must cast defensively — this writes a
tz-naive parquet fixture (exactly what the driver generates) and exercises every
dt-namespace op that touches unix_micros/unix_millis over it.
"""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import polars_net_spark as pl
from polars_net_spark import col


@pytest.fixture(scope="module")
def ntz_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("ntz") / "events_ntz.parquet"
    ts = pa.array(
        [
            dt.datetime(2024, 3, 15, 14, 30, 45, 123456),
            dt.datetime(2024, 3, 15, 14, 40, 0, 500000),
            dt.datetime(2024, 3, 15, 16, 0, 1, 0),
            dt.datetime(2024, 3, 16, 1, 2, 3, 7),
        ],
        type=pa.timestamp("us"),  # no tz → Spark reads TIMESTAMP_NTZ
    )
    tbl = pa.table({"ts": ts, "uid": pa.array([1, 1, 1, 2], type=pa.int64())})
    pq.write_table(tbl, p)
    return str(p)


@pytest.fixture(scope="module")
def ntz(spark, ntz_path):
    df = pl.read_parquet(ntz_path)
    assert df.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    return df


def test_ntz_subsecond_parts(ntz):
    r = ntz.select(
        col("ts").dt.millisecond().alias("ms"),
        col("ts").dt.microsecond().alias("us"),
        col("ts").dt.nanosecond().alias("ns"),
    ).rows()
    assert r[0] == (123, 123456, 123456000)
    assert r[1] == (500, 500000, 500000000)


def test_ntz_time_of_day(ntz):
    r = ntz.select(col("ts").dt.time().alias("tod")).rows()
    assert r[2][0] == ((16 * 3600 + 1) * 1_000_000 + 0) * 1000


def test_ntz_truncate_round(ntz):
    r = ntz.select(
        col("ts").dt.truncate("15m").alias("tr"),
        col("ts").dt.round("15m").alias("rd"),
    ).rows()
    assert r[0][0] == dt.datetime(2024, 3, 15, 14, 30)
    assert r[0][1] == dt.datetime(2024, 3, 15, 14, 30)
    assert r[1][0] == dt.datetime(2024, 3, 15, 14, 30)
    assert r[1][1] == dt.datetime(2024, 3, 15, 14, 45)


def test_ntz_timestamp_units(ntz):
    base = dt.datetime(2024, 3, 15, 14, 30, 45, 123456, tzinfo=dt.timezone.utc)
    us = int(base.timestamp() * 1_000_000)
    r = ntz.select(
        col("ts").dt.timestamp("us").alias("us"),
        col("ts").dt.timestamp("ms").alias("ms"),
        col("ts").dt.timestamp("ns").alias("ns"),
    ).rows()
    assert r[0] == (us, us // 1000, us * 1000)


def test_ntz_whole_namespace_no_crash(ntz):
    # every remaining dt op must at least build + execute on NTZ input
    out = ntz.select(
        col("ts").dt.year().alias("y"),
        col("ts").dt.month().alias("mo"),
        col("ts").dt.day().alias("d"),
        col("ts").dt.ordinal_day().alias("od"),
        col("ts").dt.weekday().alias("wd"),
        col("ts").dt.hour().alias("h"),
        col("ts").dt.minute().alias("mi"),
        col("ts").dt.second().alias("s"),
        col("ts").dt.date().alias("dt"),
        col("ts").dt.to_string("%Y-%m-%d %H:%M:%S").alias("str"),
        col("ts").dt.offset_by("1d2h").alias("off"),
        col("ts").dt.truncate("1h").alias("th"),
    )
    rows = out.rows()
    assert rows[0][:8] == (2024, 3, 15, 75, 5, 14, 30, 45)
    assert rows[0][9] == "2024-03-15 14:30:45"


def test_ntz_shift_diff_sessionize_pattern(ntz):
    # the exact q37 pattern: shift + unix_micros subtraction on NTZ input
    from pyspark.sql import functions as F

    prev = col("ts").shift(1, order_by=[col("ts")], partition_by=["uid"])
    gap = pl.Expr(F.unix_micros(F.col("ts").cast("timestamp"))) - pl.Expr(
        F.unix_micros(prev._col.cast("timestamp"))
    )
    out = ntz.with_columns(gap.alias("gap_us")).sort("uid", "ts")
    gaps = [r[-1] for r in out.rows()]
    assert gaps[0] is None
    assert gaps[1] == (9 * 60 + 15) * 1_000_000 + 376544


def test_ntz_group_by_dynamic_all_closed_modes(ntz):
    # closed='right'/'both'/'none' plan unix_micros on the index column —
    # the q37 hazard class; every mode must run on NTZ input
    for closed in ("left", "right", "both", "none"):
        out = (
            ntz.group_by_dynamic("ts", every="1h", closed=closed)
            .agg(pl.col("uid").len().alias("n"))
        )
        rows = out.sort("ts").collect().rows()
        assert len(rows) >= 2, closed
    # right-closed boundary semantics on a wall-clock hour
    rows = (
        ntz.group_by_dynamic("ts", every="1h", closed="left")
        .agg(pl.col("uid").len().alias("n"))
        .sort("ts")
        .collect()
        .rows()
    )
    assert sum(r[1] for r in rows) == 4


def test_ntz_group_by_dynamic_datapoint_grouped(ntz):
    out = (
        ntz.group_by_dynamic(
            "ts", every="30m", group_by=["uid"], start_by="datapoint", label="datapoint"
        )
        .agg(pl.col("uid").len().alias("n"))
        .sort("uid", "ts")
    )
    rows = out.collect().rows()
    assert sum(r[-1] for r in rows) == 4
    # uid=1's first window anchors at its own first datapoint
    assert rows[0][1].minute == 30 and rows[0][1].second == 45


def test_ntz_group_by_dynamic_datapoint_ungrouped(ntz):
    out = (
        ntz.group_by_dynamic("ts", every="2h", start_by="datapoint")
        .agg(pl.col("uid").len().alias("n"))
        .sort("ts")
    )
    assert sum(r[-1] for r in out.collect().rows()) == 4


class TestBusinessDays:
    def test_weekday_arithmetic(self, spark):
        import datetime as dt
        import polars_net_spark as pl
        from polars_net_spark import col

        d = pl.from_records(
            [(1, dt.date(2024, 1, 3)), (2, dt.date(2024, 1, 5))], ["i", "d"]
        ).lazy()
        rows = d.select(
            col("i"),
            col("d").dt.add_business_days(1).alias("p1"),
            col("d").dt.add_business_days(5).alias("p5"),
            col("d").dt.add_business_days(-1).alias("m1"),
        ).sort("i").collect().rows()
        assert rows[0][1:] == (dt.date(2024, 1, 4), dt.date(2024, 1, 10), dt.date(2024, 1, 2))
        assert rows[1][1:] == (dt.date(2024, 1, 8), dt.date(2024, 1, 12), dt.date(2024, 1, 4))

    def test_weekend_roll(self, spark):
        import datetime as dt
        import polars_net_spark as pl
        from polars_net_spark import col
        import pytest as _pt

        sat = pl.from_records([(dt.date(2024, 1, 6),)], ["d"]).lazy()
        f = sat.select(col("d").dt.add_business_days(1, roll="forward").alias("x")).collect().rows()[0][0]
        b = sat.select(col("d").dt.add_business_days(1, roll="backward").alias("x")).collect().rows()[0][0]
        assert f == dt.date(2024, 1, 9) and b == dt.date(2024, 1, 8)
        with _pt.raises(Exception):
            sat.select(col("d").dt.add_business_days(1).alias("x")).collect().rows()
        with _pt.raises(ValueError):
            col("d").dt.add_business_days(1, roll="sideways")
