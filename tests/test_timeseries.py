"""Time series: dynamic groupby, rolling, shift/fills (FIXTURES F3/F4;
oracles TimeSeriesTests.cs:8-131, ComplexTests.fs:358-446)."""

import datetime as dt

import polars_net_spark as pl
from polars_net_spark import col


def ts_frame(spark, n=6, step_min=10, start=dt.datetime(2024, 1, 1, 10, 0)):
    rows = [(start + dt.timedelta(minutes=step_min * i), i) for i in range(n)]
    return pl.from_records(rows, ["Time", "Val"])


def test_dynamic_tumbling_left(spark):
    # F3 sample A: every=30m closed=left → sums 3 and 12
    f = ts_frame(spark)
    out = (
        f.lazy()
        .group_by_dynamic("Time", every="30m", closed="left")
        .agg(col("Val").sum().alias("Sum"), col("Val").len().alias("Count"))
        .collect()
    )
    assert [(r[1], r[2]) for r in sorted(out.rows())] == [(3, 3), (12, 3)]


def test_dynamic_label_right_and_boundaries(spark):
    f = ts_frame(spark)
    out = (
        f.lazy()
        .group_by_dynamic("Time", every="30m", label="right", include_boundaries=True)
        .agg(col("Val").len().alias("n"))
        .collect()
    )
    assert "_lower_boundary" in out.columns and "_upper_boundary" in out.columns
    rows = sorted(out.rows())
    # label=right → index equals upper boundary
    assert rows[0][2] == rows[0][1]


def test_dynamic_sliding(spark):
    # F3 sample B: 10 rows at 1-min steps, every=5m period=10m
    f = ts_frame(spark, n=10, step_min=1)
    out = (
        f.lazy()
        .group_by_dynamic("Time", every="5m", period="10m")
        .agg(col("Val").len().alias("n"))
        .collect()
    )
    counts = [r[1] for r in sorted(out.rows())]
    assert sum(counts) > 10  # sliding windows overlap → rows counted twice


def test_dynamic_closed_right(spark):
    f = ts_frame(spark, n=3, step_min=30)  # points at 10:00 10:30 11:00
    out = (
        f.lazy()
        .group_by_dynamic("Time", every="30m", closed="right")
        .agg(col("Val").len().alias("n"))
        .collect()
    )
    # closed=right: 10:00 falls into (09:30,10:00] bucket
    starts = sorted(r[0] for r in out.rows())
    assert starts[0] == dt.datetime(2024, 1, 1, 9, 30)


def test_rolling_fixed_min_periods(spark):
    df = pl.from_records([(i, float(i)) for i in range(5)], ["i", "x"])
    out = df.select(
        col("i"),
        col("x").rolling_mean("3i", order_by=[col("i")]).alias("rm"),
        col("x").rolling_sum(3, min_periods=1, order_by=[col("i")]).alias("rs"),
    ).sort("i")
    rows = out.rows()
    assert rows[0][1] is None and rows[1][1] is None  # min_periods defaults to window
    assert rows[2][1] == 1.0 and rows[4][1] == 3.0
    assert [r[2] for r in rows] == [0.0, 1.0, 3.0, 6.0, 9.0]


def test_rolling_temporal_by(spark):
    base = dt.datetime(2024, 1, 1)
    df = pl.from_records(
        [(base + dt.timedelta(days=i), 1.0) for i in range(5)], ["d", "x"]
    )
    out = df.select(
        col("d"),
        col("x").rolling_sum_by("d", "2d", closed="both").alias("s"),
    ).sort("d")
    # closed=both over 2d window: day0→1, day1→2, day2→3, day3→3, day4→3
    assert [r[1] for r in out.rows()] == [1.0, 2.0, 3.0, 3.0, 3.0]


def test_shift_diff_fills(spark):
    df = pl.from_records([(1, 10.0), (2, None), (3, 30.0)], ["i", "x"])
    out = df.select(
        col("i"),
        col("x").shift(1, order_by=[col("i")]).alias("sh"),
        col("x").diff(2, order_by=[col("i")]).alias("df"),
        col("x").forward_fill(order_by=[col("i")]).alias("ff"),
        col("x").backward_fill(order_by=[col("i")]).alias("bf"),
    ).sort("i")
    rows = out.rows()
    assert [r[1] for r in rows] == [None, 10.0, None]
    assert rows[2][2] == 20.0
    assert [r[3] for r in rows] == [10.0, 10.0, 30.0]
    assert [r[4] for r in rows] == [10.0, 30.0, 30.0]


def test_forward_fill_limit(spark):
    df = pl.from_records([(1, 1.0), (2, None), (3, None), (4, None)], ["i", "x"])
    out = df.select(col("i"), col("x").forward_fill(limit=1, order_by=[col("i")]).alias("f")).sort("i")
    assert [r[1] for r in out.rows()] == [1.0, 1.0, None, None]


def test_over_partition(spark):
    # ComplexTests.fs:222-248: aggregate-over-partition broadcast to rows
    df = pl.from_records([("a", 1.0), ("a", 3.0), ("b", 5.0)], ["k", "v"])
    out = df.select(col("k"), col("v"), col("v").mean().over("k").alias("m"))
    d = sorted(out.rows())
    assert d == [("a", 1.0, 2.0), ("a", 3.0, 2.0), ("b", 5.0, 5.0)]


def test_cum_sum(spark):
    df = pl.from_records([(1, 1.0), (2, 2.0), (3, 3.0)], ["i", "x"])
    out = df.select(col("i"), col("x").cum_sum(order_by=[col("i")]).alias("cs")).sort("i")
    assert [r[1] for r in out.rows()] == [1.0, 3.0, 6.0]


def test_dynamic_closed_both_duplicates_boundaries(spark):
    # points at 10:00, 10:15, 10:30 with every=30m: 10:00 and 10:30 are
    # boundaries → each belongs to two windows under closed='both'
    f = ts_frame(spark, n=3, step_min=15)
    out = (
        f.lazy()
        .group_by_dynamic("Time", every="30m", closed="both")
        .agg(col("Val").len().alias("n"))
        .collect()
    )
    assert sum(r[1] for r in out.rows()) == 5  # 3 rows, 2 duplicated


def test_dynamic_closed_none_drops_boundaries(spark):
    f = ts_frame(spark, n=3, step_min=15)
    out = (
        f.lazy()
        .group_by_dynamic("Time", every="30m", closed="none")
        .agg(col("Val").len().alias("n"))
        .collect()
    )
    assert sum(r[1] for r in out.rows()) == 1  # only 10:15 survives


def test_dynamic_start_by_weekday(spark):
    # weekly buckets aligned to Monday: Wed 2024-01-03 belongs to the week
    # starting Mon 2024-01-01
    f = pl.from_records([(dt.datetime(2024, 1, 3), 1)], ["Time", "Val"])
    out = (
        f.lazy()
        .group_by_dynamic("Time", every="1w", start_by="monday")
        .agg(col("Val").len().alias("n"))
        .collect()
    )
    assert out.rows()[0][0] == dt.datetime(2024, 1, 1)


def test_cube_rollup(spark):
    df = pl.from_records([("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0)], ["k1", "k2", "v"])
    ru = df.lazy().rollup("k1", "k2").agg(col("v").sum().alias("s")).collect()
    d = {(r[0], r[1]): r[2] for r in ru.rows()}
    assert d[(None, None)] == 7.0 and d[("a", None)] == 3.0 and d[("a", "x")] == 1.0
    cu = df.lazy().cube("k1", "k2").agg(col("v").sum().alias("s")).collect()
    d = {(r[0], r[1]): r[2] for r in cu.rows()}
    assert d[(None, "x")] == 5.0  # cube adds the (None, k2) slices


def test_dynamic_start_by_datapoint_per_group_anchor(spark):
    """polars anchors each group's grid at ITS OWN first data point (dynamic
    windows are computed per group) — not at the global minimum."""
    t0 = dt.datetime(2024, 1, 1, 10, 0)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        ("A", at(5), 1), ("A", at(10), 2), ("A", at(35), 4),
        ("B", at(17), 10), ("B", at(40), 20),
    ]
    f = pl.from_records(rows, ["g", "Time", "Val"])
    out = (
        f.lazy()
        .group_by_dynamic("Time", every="30m", start_by="datapoint", group_by=["g"])
        .agg(col("Val").sum().alias("s"), col("Val").len().alias("n"))
        .collect()
    )
    got = sorted((r[0], r[1], r[2], r[3]) for r in out.rows())
    # A anchored at 10:05 → [10:05,10:35) has rows 1,2; [10:35,11:05) has 4
    # B anchored at 10:17 → [10:17,10:47) has both rows (global-min anchoring
    # would split B into two windows — the bug this test pins)
    assert got == [
        ("A", at(5), 3, 2),
        ("A", at(35), 4, 1),
        ("B", at(17), 30, 2),
    ]


def test_dynamic_start_by_datapoint_ungrouped(spark):
    f = ts_frame(spark)  # 6 rows from 10:00, 10-min steps
    out = (
        f.lazy()
        .group_by_dynamic("Time", every="45m", start_by="datapoint")
        .agg(col("Val").sum().alias("s"))
        .collect()
    )
    rows = sorted(out.rows())
    assert rows[0][0] == dt.datetime(2024, 1, 1, 10, 0)
    # grid anchored at first point: [10:00,10:45) → 0+1+2+3+4? no: 10:40 is
    # within [10:00,10:45) → vals 0..4 sum 10; [10:45,11:30) → val 5
    assert [(r[1]) for r in rows] == [10, 5]


class TestIntDynamicWindows:
    def test_left_right_offset_label(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        lf = pl.from_records(
            [(1, 1.0), (5, 2.0), (10, 3.0), (11, 4.0), (20, 5.0)], ["i", "v"]
        ).lazy()
        left = lf.group_by_dynamic("i", every="10i").agg(col("v").sum().alias("s")).collect().rows()
        assert left == [(0, 3.0), (10, 7.0), (20, 5.0)]
        right = (
            lf.group_by_dynamic("i", every="10i", closed="right")
            .agg(col("v").sum().alias("s")).collect().rows()
        )
        assert right == [(0, 6.0), (10, 9.0)]
        dp = (
            lf.group_by_dynamic("i", every="10i", offset="3i", label="datapoint")
            .agg(col("v").sum().alias("s")).collect().rows()
        )
        assert dp == [(1, 1.0), (5, 9.0), (20, 5.0)]
        bounds = (
            lf.group_by_dynamic("i", every="10i", label="right", include_boundaries=True)
            .agg(col("v").sum().alias("s")).collect().rows()
        )
        assert bounds[0] == (10, 0, 10, 3.0)

    def test_grouped_and_guards(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col
        import pytest as _pt

        lf = pl.from_records(
            [("a", 1, 1.0), ("a", 11, 2.0), ("b", 2, 3.0)], ["k", "i", "v"]
        ).lazy()
        out = (
            lf.group_by_dynamic("i", every="10i", group_by=["k"])
            .agg(col("v").sum().alias("s")).collect().rows()
        )
        assert ("a", 0, 1.0) in out and ("a", 10, 2.0) in out and ("b", 0, 3.0) in out
        with _pt.raises(ValueError):
            lf.group_by_dynamic("i", every="10i", period="20i").agg(col("v").sum())
        with _pt.raises(ValueError):
            lf.group_by_dynamic("i", every="10i", closed="both").agg(col("v").sum())
        with _pt.raises(ValueError):
            lf.group_by_dynamic("i", every="10i", start_by="datapoint").agg(col("v").sum())


def test_shift_fill_value(spark):
    import polars_net_spark as pl
    from polars_net_spark import col

    lf = pl.from_records([(1, 1, 10.0), (1, 2, 20.0)], ["k", "i", "v"]).lazy()
    out = lf.select(
        col("i"),
        col("v").shift(1, order_by="i", partition_by=["k"], fill_value=0.0).alias("p"),
        col("v").shift(-1, order_by="i", partition_by=["k"], fill_value=-1.0).alias("n"),
        col("v").shift(1, order_by="i", partition_by=["k"]).alias("pn"),
    ).sort("i").collect().rows()
    assert out[0][1:] == (0.0, 20.0, None)
    assert out[1][1:] == (10.0, -1.0, 10.0)
