"""Tests for the r2 snapshot-commit operator batch (VERDICT r2 item 3):
ewm family, rolling_quantile/median, interpolate, value_counts,
is_duplicated family, pct_change, mode, map_groups — plus the ADVICE fixes
(polars-null pct_change, 'nearest' rolling default, ignore_nulls=False ewm
default, map_groups order-col hygiene, value_counts arg validation) and the
single-task warnings.
"""

import math
import warnings

import pandas as pd
import pytest

import polars_net_spark as pl
from polars_net_spark import col


def _vals(df, c, order="i"):
    return [r[0] for r in df.sort(order).select(col(c)).rows()]


# -- pct_change ------------------------------------------------------------


def test_pct_change_polars_null_semantics(spark):
    # polars forward-fills before shift/diff: [1,null,null,4] -> [null,0,0,3]
    df = pl.from_records([(i, v) for i, v in enumerate([1.0, None, None, 4.0])], ["i", "x"])
    out = df.with_columns(col("x").pct_change(order_by=[col("i")]).alias("pc"))
    assert _vals(out, "pc") == [None, 0.0, 0.0, 3.0]


def test_pct_change_n2(spark):
    df = pl.from_records([(i, float(v)) for i, v in enumerate([2, 4, 8, 16])], ["i", "x"])
    out = df.with_columns(col("x").pct_change(2, order_by=[col("i")]).alias("pc"))
    assert _vals(out, "pc") == [None, None, 3.0, 3.0]


# -- rolling_quantile / rolling_median ------------------------------------


def test_rolling_quantile_default_nearest(spark):
    # default interpolation must be 'nearest' (polars + Expr.quantile parity)
    df = pl.from_records([(i, float(i)) for i in range(5)], ["i", "x"])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = df.with_columns(
            col("x").rolling_quantile(0.5, 4, min_periods=1, order_by=[col("i")]).alias("q")
        )
    # window [0,1,2,3]: pos=(4-1)*0.5=1.5 -> ties round half up -> index 2
    assert _vals(out, "q")[3] == 2.0


def test_rolling_median_linear(spark):
    df = pl.from_records([(i, float(v)) for i, v in enumerate([1, 3, 5, 7])], ["i", "x"])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = df.with_columns(
            col("x").rolling_median(2, min_periods=1, order_by=[col("i")]).alias("m")
        )
    assert _vals(out, "m") == [1.0, 2.0, 4.0, 6.0]


def test_rolling_quantile_min_periods_mask(spark):
    df = pl.from_records([(i, float(i)) for i in range(4)], ["i", "x"])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = df.with_columns(
            col("x").rolling_quantile(0.5, 3, interpolation="linear", order_by=[col("i")]).alias("q")
        )
    v = _vals(out, "q")
    assert v[0] is None and v[1] is None and v[2] == 1.0 and v[3] == 2.0


# -- interpolate -----------------------------------------------------------


def test_interpolate_linear_and_edges(spark):
    xs = [None, 1.0, None, None, 4.0, None]
    df = pl.from_records(list(enumerate(xs)), ["i", "x"])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = df.with_columns(col("x").interpolate(order_by=[col("i")]).alias("y"))
    assert _vals(out, "y") == [None, 1.0, 2.0, 3.0, 4.0, None]


def test_interpolate_partitioned(spark):
    rows = [(0, "a", 0.0), (1, "a", None), (2, "a", 2.0), (0, "b", 10.0), (1, "b", None), (2, "b", 30.0)]
    df = pl.from_records(rows, ["i", "k", "x"])
    out = df.with_columns(
        col("x").interpolate(order_by=[col("i")], partition_by=["k"]).alias("y")
    ).sort("k", "i")
    assert [r[0] for r in out.select(col("y")).rows()] == [0.0, 1.0, 2.0, 10.0, 20.0, 30.0]


# -- ewm -------------------------------------------------------------------


def test_ewm_mean_matches_closed_form(spark):
    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    df = pl.from_records([(i, "k", v) for i, v in enumerate(xs)], ["i", "k", "x"])
    out = df.with_ewm_mean("x", alpha=0.5, order_by=["i"], partition_by=["k"], out_col="e")
    got = _vals(out, "e")
    exp = pd.Series(xs).ewm(alpha=0.5, adjust=True).mean().tolist()
    assert got == pytest.approx(exp)


def test_ewm_default_ignore_nulls_false(spark):
    # modern polars (>=1.0) / pandas default: absolute-position weights
    xs = [1.0, None, 3.0]
    df = pl.from_records([(i, "k", v) for i, v in enumerate(xs)], ["i", "k", "x"])
    out = df.with_ewm_mean("x", alpha=0.5, order_by=["i"], partition_by=["k"], out_col="e")
    got = _vals(out, "e")
    exp = pd.Series(xs).ewm(alpha=0.5, adjust=True, ignore_na=False).mean()
    # ignore_na=False: weights 0.25/1.0 -> (0.25*1 + 1*3)/1.25 = 2.6
    assert got[2] == pytest.approx(2.6)
    assert got == pytest.approx(exp.tolist())


def test_ewm_var_std_debiased(spark):
    xs = [1.0, 2.0, 4.0, 8.0]
    df = pl.from_records([(i, "k", v) for i, v in enumerate(xs)], ["i", "k", "x"])
    out = df.with_ewm_var("x", alpha=0.3, order_by=["i"], partition_by=["k"], out_col="v")
    out = out.with_ewm_std("x", alpha=0.3, order_by=["i"], partition_by=["k"], out_col="s")
    gv, gs = _vals(out, "v"), _vals(out, "s")
    ev = pd.Series(xs).ewm(alpha=0.3, adjust=True).var(bias=False)
    assert gv[0] is None or math.isnan(gv[0])  # single obs -> debiased var undefined
    assert gv[1:] == pytest.approx(ev.tolist()[1:])
    assert gs[1:] == pytest.approx(ev.pow(0.5).tolist()[1:])


# -- distinctness flags / mode --------------------------------------------


def test_is_duplicated_family(spark):
    df = pl.from_records([(0, 1), (1, 1), (2, 2), (3, None), (4, None)], ["i", "k"])
    out = df.with_columns(
        col("k").is_duplicated().alias("dup"),
        col("k").is_unique().alias("uni"),
        col("k").is_first_distinct(order_by=[col("i")]).alias("fst"),
        col("k").is_last_distinct(order_by=[col("i")]).alias("lst"),
    ).sort("i")
    rows = out.select(col("dup"), col("uni"), col("fst"), col("lst")).rows()
    assert [r[0] for r in rows] == [True, True, False, True, True]  # nulls group together
    assert [r[1] for r in rows] == [False, False, True, False, False]
    assert [r[2] for r in rows] == [True, False, True, True, False]
    assert [r[3] for r in rows] == [False, True, True, False, True]


def test_mode_deterministic_tiebreak(spark):
    df = pl.from_records([("a", 2), ("a", 2), ("a", 1), ("a", 1), ("b", 9)], ["g", "x"])
    out = df.group_by("g").agg(col("x").mode().alias("m")).sort("g")
    assert [r[0] for r in out.select(col("m")).rows()] == [1, 9]  # tie -> smallest


# -- value_counts ----------------------------------------------------------


def test_value_counts(spark):
    df = pl.from_records([("a",), ("b",), ("a",), ("a",), ("b",)], ["x"])
    out = df.value_counts("x", name="n")
    assert out.rows() == [("a", 3), ("b", 2)]


def test_value_counts_empty_raises(spark):
    df = pl.from_records([("a",)], ["x"])
    with pytest.raises(ValueError, match="at least one column"):
        df.value_counts()


# -- map_groups ------------------------------------------------------------


def test_map_groups_no_hidden_column_leak(spark):
    # force the hidden row-order column to exist before grouping
    lf = pl.from_records([(1, 10.0), (1, 20.0), (2, 5.0)], ["k", "v"]).lazy().with_row_index()
    assert "__row_order__" in lf._sdf.columns

    def fn(pdf):
        assert "__row_order__" not in pdf.columns, "hidden column leaked into map_groups fn"
        return pdf[["k"]].assign(total=pdf["v"].sum())

    out = lf.group_by("k").map_groups(fn, "k bigint, total double")
    assert sorted(tuple(r) for r in out.spark.collect()) == [(1, 30.0), (1, 30.0), (2, 5.0)]


# -- single-task warnings --------------------------------------------------


def test_single_partition_warnings(spark):
    df = pl.from_records([(i, float(i)) for i in range(3)], ["i", "x"])
    with pytest.warns(UserWarning, match="single global-window task"):
        df.with_columns(col("x").interpolate(order_by=[col("i")]).alias("y"))
    with pytest.warns(UserWarning, match="single global-window task"):
        df.with_columns(
            col("x").rolling_quantile(0.5, 2, min_periods=1, order_by=[col("i")]).alias("y")
        )
    # r8: unkeyed EWM over a numeric order column is now distributed
    # (bucket fold + carry) — no warning; alpha=1 still degenerates to the
    # warned single-task path (rho=0 has no carry)
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        df.with_ewm_mean("x", alpha=0.5, order_by=["i"], out_col="e")
    with pytest.warns(UserWarning, match="single global-window task"):
        df.with_ewm_mean("x", alpha=1.0, order_by=["i"], out_col="e")


def test_no_warning_when_partitioned(spark):
    df = pl.from_records([(i, "k", float(i)) for i in range(3)], ["i", "k", "x"])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        df.with_columns(
            col("x").interpolate(order_by=[col("i")], partition_by=["k"]).alias("y")
        )
        df.with_ewm_mean("x", alpha=0.5, order_by=["i"], partition_by=["k"], out_col="e")


class TestEwmMeanBy:
    """Time-decay EWM (polars ewm_mean_by; operators/ewm.py)."""

    def _frame(self, spark, rows):
        return pl.LazyFrame(
            spark.createDataFrame(rows, "uid long, ts timestamp, v double")
        )

    def test_recursion(self, spark):
        import datetime as dt

        rows = [
            (1, dt.datetime(2024, 1, 1, 0, 0), 10.0),
            (1, dt.datetime(2024, 1, 1, 6, 0), 20.0),   # exactly one half-life later
            (1, dt.datetime(2024, 1, 1, 18, 0), 40.0),  # two half-lives later
        ]
        out = (
            self._frame(spark, rows)
            .with_ewm_mean_by("v", by="ts", half_life="6h", partition_by=["uid"])
            .sort("ts")
            .collect()
            .rows()
        )
        y0 = 10.0
        y1 = 20.0 + 0.5 * (y0 - 20.0)      # a = 0.5**1
        y2 = 40.0 + 0.25 * (y1 - 40.0)     # a = 0.5**2
        got = [r[3] for r in out]
        assert got[0] == pytest.approx(y0)
        assert got[1] == pytest.approx(y1)
        assert got[2] == pytest.approx(y2)

    def test_null_skips_state_and_clock(self, spark):
        import datetime as dt

        rows = [
            (1, dt.datetime(2024, 1, 1, 0, 0), 10.0),
            (1, dt.datetime(2024, 1, 1, 3, 0), None),
            (1, dt.datetime(2024, 1, 1, 6, 0), 20.0),
        ]
        out = (
            self._frame(spark, rows)
            .with_ewm_mean_by("v", by="ts", half_life="6h", partition_by=["uid"])
            .sort("ts")
            .collect()
            .rows()
        )
        assert out[1][3] is None
        # decay measured from the previous NON-NULL observation (6h span)
        assert out[2][3] == pytest.approx(20.0 + 0.5 * (10.0 - 20.0))

    def test_zero_dt_tie_keeps_state(self, spark):
        import datetime as dt

        t = dt.datetime(2024, 1, 1, 0, 0)
        rows = [(1, t, 10.0), (1, t, 99.0)]
        out = (
            self._frame(spark, rows)
            .with_ewm_mean_by("v", by="ts", half_life="6h", partition_by=["uid"])
            .collect()
            .rows()
        )
        # dt=0 -> a=1 -> the tied second row contributes nothing
        assert sorted(r[3] for r in out) == [10.0, 10.0]

    def test_unkeyed_distributed_no_warn(self, spark):
        # r8: unkeyed time-decay EWM over a temporal by column is now
        # distributed (bucket fold + (y, t_last) carry) — no warning
        import datetime as dt
        import warnings as _w

        rows = [(1, dt.datetime(2024, 1, 1), 1.0), (2, dt.datetime(2024, 1, 1, 2), 3.0)]
        lf = self._frame(spark, rows)
        with _w.catch_warnings():
            _w.simplefilter("error")
            out = lf.with_ewm_mean_by("v", by="ts", half_life="1h").collect().rows()
        got = {r[0]: r[-1] for r in out}
        assert got[1] == 1.0
        assert abs(got[2] - (3.0 + 0.25 * (1.0 - 3.0))) < 1e-12  # a=0.5^2

    def test_bad_half_life(self, spark):
        import datetime as dt

        rows = [(1, dt.datetime(2024, 1, 1), 1.0)]
        lf = self._frame(spark, rows)
        with pytest.raises(ValueError):
            lf.with_ewm_mean_by("v", by="ts", half_life="-1h", partition_by=["uid"])


class TestRollingStdVar:
    def test_values(self, spark):
        import statistics

        lf = pl.from_records(
            [(1, i, float(v)) for i, v in enumerate([2, 4, 4, 4, 5, 5, 7, 9])],
            ["k", "i", "v"],
        ).lazy()
        out = (
            lf.select(
                pl.col("i"),
                pl.col("v").rolling_var(3, order_by="i", partition_by=["k"]).alias("rv"),
                pl.col("v").rolling_std(3, order_by="i", partition_by=["k"]).alias("rs"),
                pl.col("v").rolling_var(3, order_by="i", partition_by=["k"], ddof=0).alias("rvp"),
            )
            .sort("i")
            .collect()
            .rows()
        )
        assert out[0][1] is None and out[1][1] is None  # min_periods = window
        vals = [2.0, 4.0, 4.0]
        assert out[2][1] == pytest.approx(statistics.variance(vals))
        assert out[2][2] == pytest.approx(statistics.stdev(vals))
        assert out[2][3] == pytest.approx(statistics.pvariance(vals))

    def test_rolling_std_by_temporal(self, spark):
        import datetime as dt

        rows = [
            (1, dt.datetime(2024, 1, 1, 0, 0), 1.0),
            (1, dt.datetime(2024, 1, 1, 1, 0), 3.0),
            (1, dt.datetime(2024, 1, 1, 9, 0), 5.0),
        ]
        lf = pl.LazyFrame(spark.createDataFrame(rows, "k long, ts timestamp, v double"))
        out = (
            lf.select(
                pl.col("ts"),
                pl.col("v").rolling_var_by("ts", "2h", closed="both", partition_by=["k"]).alias("rv"),
            )
            .sort("ts")
            .collect()
            .rows()
        )
        assert out[0][1] is None          # single value, sample var undefined
        assert out[1][1] == pytest.approx(2.0)   # var([1,3])
        assert out[2][1] is None          # 9:00 window excludes earlier rows


class TestInterpolateBy:
    def test_time_weighted(self, spark):
        import datetime as dt

        rows = [
            (1, dt.datetime(2024, 1, 1, 0, 0), 0.0),
            (1, dt.datetime(2024, 1, 1, 1, 0), None),
            (1, dt.datetime(2024, 1, 1, 4, 0), 8.0),
            (1, dt.datetime(2024, 1, 1, 5, 0), None),
        ]
        sdf = spark.createDataFrame(rows, "k long, ts timestamp, v double")
        out = pl.LazyFrame(sdf).select(
            pl.col("ts"),
            pl.col("v").interpolate_by("ts", partition_by=["k"]).alias("iv"),
        ).sort("ts").collect().rows()
        assert [r[1] for r in out] == [0.0, 2.0, 8.0, None]  # 1h of 4h gap

    def test_numeric_coordinate(self, spark):
        rows = [(1, 0.0, 0.0), (1, 1.0, None), (1, 10.0, 100.0)]
        sdf = spark.createDataFrame(rows, "k long, x double, v double")
        out = pl.LazyFrame(sdf).select(
            pl.col("x"),
            pl.col("v").interpolate_by("x", partition_by=["k"], coordinate="numeric").alias("iv"),
        ).sort("x").collect().rows()
        assert out[1][1] == pytest.approx(10.0)
        import pytest as _pt

        with _pt.raises(ValueError):
            pl.col("v").interpolate_by("x", partition_by=["k"], coordinate="log")
