"""Expression semantics (reference oracles: ExprTests.cs/fs, CleaningTests.cs)."""

import math

import pytest

import polars_net_spark as pl
from polars_net_spark import col, lit, when


def test_select_arithmetic(people):
    out = people.select(
        col("name"),
        (col("salary") * 2).alias("double_salary"),
        (col("age") + 1).alias("age_next"),
    )
    rows = sorted(out.rows())
    assert rows[0] == ("Alice", 200.0, 26)


def test_comparison_filter(people):
    assert people.filter(col("age") > 26).height == 2
    assert people.filter(col("name") == "Bob").height == 1
    assert people.filter((col("age") > 26) & (col("salary") < 250.0)).height == 1
    assert people.filter(~(col("age") > 26)).height == 1


def test_when_then_otherwise(people):
    out = people.select(
        when(col("age") < 28).then(lit("young")).when(col("age") < 33).then(lit("mid")).otherwise(lit("old")).alias("bucket")
    )
    assert sorted(r[0] for r in out.rows()) == ["mid", "old", "young"]


def test_floor_div_mod_pow(spark):
    df = pl.from_records([(7, 2)], ["a", "b"])
    out = df.select(
        (col("a") // col("b")).alias("fd"),
        (col("a") % col("b")).alias("md"),
        col("a").pow(2).alias("pw"),
    )
    assert out.rows()[0] == (3, 1, 49.0)


def test_cast_nonstrict_null(spark):
    # CleaningTests.cs:76-100: "NotANumber"→null, "NaN"→NaN
    df = pl.from_records([("100",), ("200.5",), ("NotANumber",), ("NaN",), (None,)], ["raw"])
    vals = [r[0] for r in df.select(col("raw").cast("f64").alias("v")).rows()]
    assert vals[0] == 100.0 and vals[1] == 200.5
    assert vals[2] is None and math.isnan(vals[3]) and vals[4] is None


def test_cast_strict_aborts(spark):
    df = pl.from_records([("abc",)], ["raw"])
    with pytest.raises(Exception):
        df.select(col("raw").cast("f64", strict=True)).rows()


def test_null_nan_ops(spark):
    df = pl.from_records([(1.0,), (float("nan"),), (None,)], ["x"])
    out = df.select(
        col("x").is_null().alias("isn"),
        col("x").fill_null(0.0).alias("fn"),
        col("x").fill_nan(-1.0).alias("fna"),
    )
    rows = out.rows()
    assert [r[0] for r in rows] == [False, False, True]
    assert rows[2][1] == 0.0
    assert rows[1][2] == -1.0


def test_is_between_closed(spark):
    df = pl.from_records([(1,), (2,), (3,)], ["x"])
    assert df.filter(col("x").is_between(1, 3)).height == 3
    assert df.filter(col("x").is_between(1, 3, closed="none")).height == 1
    assert df.filter(col("x").is_between(1, 3, closed="left")).height == 2


def test_is_in(spark):
    df = pl.from_records([("a",), ("b",), ("c",)], ["x"])
    assert df.filter(col("x").is_in(["a", "c"])).height == 2


def test_math_round(spark):
    # reference rounds half-away-from-zero (expr.rs:868-876)
    df = pl.from_records([(2.5,), (-2.5,), (2.44,)], ["x"])
    vals = [r[0] for r in df.select(col("x").round(0).alias("r")).rows()]
    assert vals == [3.0, -3.0, 2.0]
    df2 = pl.from_records([(4.0,)], ["x"])
    out = df2.select(
        col("x").sqrt().alias("s"), col("x").log(2).alias("l"), (-col("x")).abs().alias("a")
    )
    assert out.rows()[0] == (2.0, 2.0, 4.0)


def test_agg_exprs(people):
    out = people.lazy().select(
        col("salary").sum().alias("s"),
        col("salary").mean().alias("m"),
        col("age").min().alias("mn"),
        col("age").max().alias("mx"),
        col("age").count().alias("c"),
        col("age").len().alias("l"),
    ).collect()
    assert out.rows()[0] == (600.0, 200.0, 25, 35, 3, 3)


def test_std_var_median(spark):
    df = pl.from_records([(1.0,), (2.0,), (3.0,), (4.0,)], ["x"])
    out = df.select(
        col("x").std().alias("sd"),
        col("x").var(ddof=0).alias("vp"),
        col("x").median().alias("md"),
    )
    sd, vp, md = out.rows()[0]
    assert abs(sd - 1.2909944487358056) < 1e-12
    assert abs(vp - 1.25) < 1e-12
    assert md == 2.5


def test_quantile_interpolations(spark):
    df = pl.from_records([(1.0,), (2.0,), (3.0,), (4.0,)], ["x"])
    q = lambda interp: df.select(col("x").quantile(0.5, interp).alias("q")).rows()[0][0]
    assert q("linear") == 2.5
    assert q("lower") == 2.0
    assert q("higher") == 3.0
    assert q("midpoint") == 2.5
    assert q("nearest") == 3.0  # pos=1.5: polars rounds half away from zero → higher


def test_implode_n_unique(spark):
    df = pl.from_records([("a", 1), ("a", 2), ("b", 1)], ["k", "v"])
    out = df.lazy().group_by("k").agg(
        col("v").implode().alias("vs"), col("v").n_unique().alias("nu")
    ).collect()
    d = {r[0]: (sorted(r[1]), r[2]) for r in out.rows()}
    assert d == {"a": ([1, 2], 2), "b": ([1], 1)}


def test_name_prefix_suffix(people):
    out = people.select(col("age").name.prefix("p_"), col("salary").name.suffix("_s"))
    assert out.columns == ["p_age", "salary_s"]


def test_cut_buckets(spark):
    import polars_net_spark as plx

    d = plx.from_records(
        [(0, 5.0), (1, 10.0), (2, 10.5), (3, 40.0), (4, 41.0), (5, None)],
        ["i", "v"],
    ).lazy()
    out = d.with_columns(plx.col("v").cut([10.0, 25.0, 40.0]).alias("b")).collect()
    got = {r[0]: r[2] for r in out.rows()}
    # right-closed: 10.0 stays in bucket 0, 40.0 in bucket 2
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: None}
    left = d.with_columns(
        plx.col("v").cut([10.0, 25.0, 40.0], left_closed=True).alias("b")
    ).collect()
    lgot = {r[0]: r[2] for r in left.rows()}
    assert lgot[1] == 1 and lgot[3] == 3  # boundaries move up when left-closed

    import pytest

    with pytest.raises(ValueError):
        plx.col("v").cut([3.0, 1.0])


def test_with_qcut_quartiles(spark):
    import polars_net_spark as plx

    d = plx.from_records([(i, float(i)) for i in range(1, 101)], ["i", "v"]).lazy()
    out = d.with_qcut("v", 4, "qb").collect()
    buckets = {}
    for _, v, qb in out.rows():
        buckets.setdefault(qb, []).append(v)
    # exact quartile boundaries of 1..100 (linear interp): 25.75, 50.5, 75.25
    assert sorted(buckets) == [0, 1, 2, 3]
    assert max(buckets[0]) == 25.0 and min(buckets[1]) == 26.0
    assert max(buckets[1]) == 50.0 and min(buckets[2]) == 51.0
    assert len(buckets[0]) == 25

    import pytest

    with pytest.raises(ValueError):
        d.with_qcut("v", [0.5, 0.2])


def test_with_qcut_approx_matches_exact_here(spark):
    """approx=True (sketch boundaries) assigns the same buckets as exact on
    well-separated data — the scale-safe variant is a drop-in."""
    import polars_net_spark as plx

    d = plx.from_records([(i, float(i)) for i in range(1, 101)], ["i", "v"]).lazy()
    exact = dict(d.with_qcut("v", 4, "qb").collect().select(plx.col("i"), plx.col("qb")).rows())
    approx = dict(
        d.with_qcut("v", 4, "qb", approx=True).collect().select(plx.col("i"), plx.col("qb")).rows()
    )
    diffs = sum(1 for k in exact if exact[k] != approx[k])
    assert diffs <= 2  # sketch may shift an edge by <= 1 rank


class TestTopKAgg:
    def test_top_bottom_k(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        lf = pl.from_records(
            [("a", 5), ("a", 1), ("a", 9), ("a", None), ("b", 2)], ["k", "v"]
        ).lazy()
        out = {
            r[0]: (list(r[1]), list(r[2]))
            for r in lf.group_by("k")
            .agg(col("v").top_k(2).alias("t"), col("v").bottom_k(2).alias("b"))
            .collect()
            .rows()
        }
        assert out["a"] == ([9, 5], [1, 5])
        assert out["b"] == ([2], [2])


class TestMathExtras:
    def test_trig_and_friends(self, spark):
        import math
        import polars_net_spark as pl
        from polars_net_spark import col

        df = pl.from_records([(0.5,), (-2.0,)], ["x"])
        out = df.select(
            col("x").sin().alias("s"), col("x").arcsin().alias("as_"),
            col("x").cosh().alias("ch"), col("x").sign().alias("sg"),
            col("x").log10().alias("l10"), col("x").log1p().alias("l1p"),
            col("x").radians().alias("rad"), col("x").cbrt().alias("cb"),
        ).rows()
        r = out[0]
        assert r[0] == pytest.approx(math.sin(0.5))
        assert r[1] == pytest.approx(math.asin(0.5))
        assert r[2] == pytest.approx(math.cosh(0.5))
        assert r[3] == 1.0
        assert r[4] == pytest.approx(math.log10(0.5))
        assert r[5] == pytest.approx(math.log1p(0.5))
        assert r[6] == pytest.approx(math.radians(0.5))
        assert out[1][3] == -1.0
        import math as m
        assert out[1][7] == pytest.approx(-(2.0 ** (1 / 3)))

    def test_arctan2_format_concat_list(self, spark):
        import math
        import polars_net_spark as pl
        from polars_net_spark import col

        df = pl.LazyFrame(
            spark.createDataFrame([(1.0, 2.0, "a", None)], "y double, x double, s string, t string")
        )
        out = df.select(
            pl.arctan2("y", "x").alias("a"),
            pl.format("{}-{}!", col("s"), col("x")).alias("f"),
            pl.format("{}:{}", col("s"), col("t")).alias("fn"),
            pl.concat_list("y", "x").alias("cl"),
        ).collect().rows()[0]
        assert out[0] == pytest.approx(math.atan2(1.0, 2.0))
        assert out[1] == "a-2.0!"
        assert out[2] is None  # null poisons the whole formatted string
        assert list(out[3]) == [1.0, 2.0]

    def test_concat_list_lists_mode(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        sdf = spark.createDataFrame([([1, 2], [3])], "a array<int>, b array<int>")
        out = pl.LazyFrame(sdf).select(
            pl.concat_list("a", "b", lists=True).alias("cl")
        ).collect().rows()[0]
        assert list(out[0]) == [1, 2, 3]

    def test_format_placeholder_mismatch(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        with pytest.raises(ValueError):
            pl.format("{}-{}", col("x"))


class TestRankMethods:
    def test_all_methods(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        lf = pl.from_records(
            [("a", 10), ("a", 20), ("a", 20), ("a", 30)], ["k", "v"]
        ).lazy()
        out = (
            lf.select(
                col("v"),
                col("v").rank("min", partition_by=["k"]).alias("rmin"),
                col("v").rank("max", partition_by=["k"]).alias("rmax"),
                col("v").rank("average", partition_by=["k"]).alias("ravg"),
                col("v").rank("dense", partition_by=["k"]).alias("rdense"),
            )
            .sort("v")
            .collect()
            .rows()
        )
        # v=20 ties: min 2, max 3, average 2.5
        assert [r[1] for r in out] == [1, 2, 2, 4]
        assert [r[2] for r in out] == [1, 3, 3, 4]
        assert [r[3] for r in out] == [1.0, 2.5, 2.5, 4.0]
        assert [r[4] for r in out] == [1, 2, 2, 3]

    def test_bad_method(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        lf = pl.from_records([("a", 1)], ["k", "v"]).lazy()
        with pytest.raises(ValueError):
            lf.select(col("v").rank("random", partition_by=["k"]))


class TestCondAgg:
    def test_filter_in_agg(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        lf = pl.from_records(
            [("a", 1, 10.0), ("a", 5, 20.0), ("a", 9, 30.0), ("b", 9, 40.0)],
            ["k", "q", "p"],
        ).lazy()
        out = {
            r[0]: (r[1], r[2], r[3])
            for r in lf.group_by("k")
            .agg(
                col("p").filter(col("q") > 3).sum().alias("s"),
                col("p").filter(col("q") > 3).count().alias("n"),
                col("p").where(col("q") > 3, col("p") < 25.0).mean().alias("m"),
            )
            .collect()
            .rows()
        }
        assert out["a"] == (50.0, 2, 20.0)
        assert out["b"] == (40.0, 1, None)  # p=40 fails p<25 -> empty mean

    def test_no_predicates_identity(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        lf = pl.from_records([("a", 1.0)], ["k", "v"]).lazy()
        got = lf.group_by("k").agg(col("v").filter().sum().alias("s")).collect().rows()
        assert got == [("a", 1.0)]

    def test_filter_len_first_last(self, spark):
        """filter + len counts SURVIVORS (polars: 2, not group size 3);
        filter + first/last return the first/last surviving value, not the
        mask's null (round-3 advice item)."""
        import polars_net_spark as pl
        from polars_net_spark import col

        lf = pl.from_records(
            [("a", 1, 10.0), ("a", 5, 20.0), ("a", 9, 30.0), ("b", 1, 40.0)],
            ["k", "q", "p"],
        ).lazy()
        out = {
            r[0]: (r[1], r[2], r[3])
            for r in lf.group_by("k")
            .agg(
                col("p").filter(col("q") > 3).len().alias("n"),
                col("p").filter(col("q") > 3).first().alias("f"),
                col("p").filter(col("q") > 3).last().alias("l"),
            )
            .collect()
            .rows()
        }
        assert out["a"] == (2, 20.0, 30.0)
        assert out["b"] == (0, None, None)

    def test_filter_len_counts_surviving_nulls(self, spark):
        """A surviving element that is itself null still counts toward
        filtered len (polars keeps it; count() would not)."""
        import polars_net_spark as pl
        from polars_net_spark import col

        lf = pl.from_records(
            [("a", 5, None), ("a", 5, 20.0), ("a", 1, 30.0)],
            ["k", "q", "p"],
        ).lazy()
        got = (
            lf.group_by("k")
            .agg(
                col("p").filter(col("q") > 3).len().alias("n"),
                col("p").filter(col("q") > 3).count().alias("c"),
            )
            .collect()
            .rows()
        )
        assert got == [("a", 2, 1)]


class TestCutLabels:
    def test_labels_and_guard(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        sdf = spark.createDataFrame([(5.0,), (10.0,), (11.0,), (None,)], "v double")
        out = pl.LazyFrame(sdf).select(
            col("v").cut([10.0], labels=["lo", "hi"]).alias("b")
        ).collect().rows()
        assert [r[0] for r in out] == ["lo", "lo", "hi", None]  # right-closed: 10 -> lo
        left = pl.LazyFrame(sdf).select(
            col("v").cut([10.0], left_closed=True, labels=["lo", "hi"]).alias("b")
        ).collect().rows()
        assert [r[0] for r in left] == ["lo", "hi", "hi", None]
        with pytest.raises(ValueError):
            col("v").cut([10.0], labels=["only-one"])


class TestDotTopKBy:
    def test_dot(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        d = pl.from_records([(1.0, 2.0), (3.0, 4.0), (None, 5.0)], ["a", "b"]).lazy()
        assert d.select(col("a").dot("b").alias("d")).collect().rows() == [(14.0,)]

    def test_top_bottom_k_by(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        d = pl.from_records(
            [("g", "x", 1), ("g", "y", 9), ("g", "z", 5), ("g", "w", None)],
            ["k", "name", "score"],
        ).lazy()
        out = (
            d.group_by("k")
            .agg(
                col("name").top_k_by("score", 2).alias("top"),
                col("name").bottom_k_by("score", 2).alias("bot"),
            )
            .collect()
            .rows()
        )
        assert out == [("g", ["y", "z"], ["x", "z"])]


class TestMathExtras:
    def test_inverse_hyperbolic_and_cot(self, spark):
        import math
        import polars_net_spark as pl
        from polars_net_spark import col

        d = pl.from_records([(0.5,), (2.0,)], ["x"]).lazy()
        r = d.select(
            col("x").cot().alias("ct"), col("x").arcsinh().alias("ash"),
            col("x").arccosh().alias("ach"), col("x").arctanh().alias("ath"),
        ).collect().rows()
        assert r[0][0] == pytest.approx(1 / math.tan(0.5))
        assert r[0][1] == pytest.approx(math.asinh(0.5))
        assert math.isnan(r[0][2])  # arccosh < 1 -> NaN
        assert r[0][3] == pytest.approx(math.atanh(0.5))
        assert r[1][2] == pytest.approx(math.acosh(2.0))
        assert math.isnan(r[1][3])  # arctanh |x|>1 -> NaN, not null

    def test_round_sig_figs_is_close(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col, lit

        d = pl.from_records([(1234.567,), (0.0,), (0.0012345,)], ["x"]).lazy()
        vals = [r[0] for r in d.select(col("x").round_sig_figs(3).alias("s")).collect().rows()]
        assert vals == [1230.0, 0.0, 0.00123]
        close = d.select(col("x").is_close(col("x") + lit(1e-13)).alias("c")).collect().rows()
        assert all(r[0] for r in close)
        with pytest.raises(ValueError):
            col("x").round_sig_figs(0)


class TestToPhysicalShrink:
    def test_to_physical_frame(self, spark):
        import datetime as dt
        import polars_net_spark as pl

        t = pl.from_records(
            [(dt.date(2024, 1, 2), dt.datetime(2024, 1, 2, 3, 4, 5), 7)],
            ["d", "ts", "i"],
        ).lazy()
        row = t.to_physical().collect().rows()[0]
        assert row == (19724, 1704164645000000, 7)

    def test_shrink_dtype(self, spark):
        import polars_net_spark as pl

        out = pl.from_records(
            [(1, 300, 100000, 3000000000)], ["a", "b", "c", "d"]
        ).lazy().shrink_dtype().collect()
        assert dict(out.dtypes) == {
            "a": "tinyint", "b": "smallint", "c": "int", "d": "bigint"
        }

    def test_extend_constant_arg_unique(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        g = pl.from_records(
            [("a", 10), ("a", 20), ("a", 10), ("a", None)], ["k", "v"]
        ).lazy()
        out = g.group_by("k").agg(
            col("v").extend_constant(0, 2).alias("ec"),
            col("v").arg_unique().alias("au"),
        ).collect().rows()
        assert out == [("a", [10, 20, 10, 0, 0], [0, 1, 3])]


class TestListExtrasR4:
    def test_list_positional(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        l = pl.from_records([(1, [3.0, 1.0, 2.0])], ["i", "v"]).lazy()
        row = l.select(
            col("v").list.last().alias("lst"),
            col("v").list.head(2).alias("hd"),
            col("v").list.tail(2).alias("tl"),
            col("v").list.diff().alias("df"),
            col("v").list.shift(1).alias("sh"),
            col("v").list.shift(-1).alias("shn"),
            col("v").list.gather([0, -1]).alias("g"),
        ).collect().rows()[0]
        assert row[0] == 2.0
        assert row[1] == [3.0, 1.0] and row[2] == [1.0, 2.0]
        assert row[3] == [None, -2.0, 1.0]
        assert row[4] == [None, 3.0, 1.0] and row[5] == [1.0, 2.0, None]
        assert row[6] == [3.0, 2.0]

    def test_list_stats_any_all(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        l = pl.from_records(
            [(1, [1.0, 2.0, 3.0, 4.0]), (2, [5.0]), (3, [])], ["i", "v"]
        ).lazy()
        rows = l.select(
            col("i"),
            col("v").list.median().alias("md"),
            col("v").list.std().alias("sd"),
            col("v").list.var(ddof=0).alias("vp"),
        ).sort("i").collect().rows()
        assert rows[0][1] == 2.5 and rows[0][2] == pytest.approx(1.2909944487358056)
        assert rows[0][3] == pytest.approx(1.25)
        assert rows[1][2] is None  # single element, ddof=1 -> null
        assert rows[2][1] is None

        b = pl.from_records([(1, [True, False]), (2, [None, None]), (3, [])], ["i", "v"]).lazy()
        out = b.select(
            col("i"), col("v").list.any().alias("a"), col("v").list.all().alias("l")
        ).sort("i").collect().rows()
        assert [(r[1], r[2]) for r in out] == [(True, False), (False, True), (False, True)]

    def test_list_gather_oob(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col
        import pytest as _pt

        l = pl.from_records([(1, [1.0])], ["i", "v"]).lazy()
        assert l.select(col("v").list.gather([0, 5], null_on_oob=True).alias("g")).collect().rows()[0][0] == [1.0, None]
        with _pt.raises(Exception):
            l.select(col("v").list.gather([5]).alias("g")).collect().rows()


class TestRollingMoments:
    def test_rolling_skew_kurtosis(self, spark):
        import numpy as np
        import polars_net_spark as pl
        from polars_net_spark import col

        vals = [1.0, 2.0, 4.0, 8.0, 16.0, 3.0]
        d = pl.from_records([(i, v) for i, v in enumerate(vals)], ["i", "x"]).lazy()
        rows = d.select(
            col("i"),
            col("x").rolling_skew(4, order_by="i").alias("sk"),
            col("x").rolling_skew(4, bias=False, order_by="i").alias("skc"),
            col("x").rolling_kurtosis(4, order_by="i").alias("ku"),
        ).sort("i").collect().rows()
        assert rows[2][1] is None  # min_periods defaults to window size
        win = np.array(vals[0:4])
        m = win.mean(); m2 = ((win - m) ** 2).mean(); m3 = ((win - m) ** 3).mean()
        m4 = ((win - m) ** 4).mean()
        assert rows[3][1] == pytest.approx(m3 / m2**1.5)
        assert rows[3][2] == pytest.approx(np.sqrt(4 * 3) / 2 * m3 / m2**1.5)
        assert rows[3][3] == pytest.approx(m4 / m2**2 - 3)

    def test_string_order_by_is_column_not_literal(self, spark):
        """Regression (r4): a bare-string order_by must order by the COLUMN —
        _c's literal fallback silently ordered windows by a constant."""
        import polars_net_spark as pl
        from polars_net_spark import col

        # scan order deliberately different from the order_by column
        d = pl.from_records([(3, 30.0), (1, 10.0), (2, 20.0)], ["t", "x"]).lazy()
        rows = d.select(
            col("t"),
            col("x").rolling_sum(2, order_by="t", min_periods=1).alias("rs"),
        ).sort("t").collect().rows()
        assert rows == [(1, 10.0), (2, 30.0), (3, 50.0)]


def test_with_qcut_labels(spark):
    import polars_net_spark as plx

    d = plx.from_records([(i, float(i)) for i in range(1, 9)], ["i", "v"]).lazy()
    out = dict(
        d.with_qcut("v", 2, "b", labels=["low", "high"]).collect()
        .select(plx.col("i"), plx.col("b")).rows()
    )
    assert out[1] == "low" and out[8] == "high"
    import pytest as _pt

    with _pt.raises(ValueError):
        d.with_qcut("v", 2, labels=["only"])


class TestTopLevelFunctions:
    def test_named_aggs(self, spark):
        import polars_net_spark as pl

        d = pl.from_records([("a", 1.0), ("a", 3.0), ("b", 5.0)], ["k", "v"]).lazy()
        out = d.group_by("k").agg(
            pl.len(), pl.count("v").alias("c"), pl.sum("v"),
            pl.first("v").alias("f"), pl.last("v").alias("l"),
            pl.n_unique("v").alias("nu"), pl.implode("v").alias("vs"),
        ).sort("k").collect().rows()
        assert out[0][:3] == ("a", 2, 2)
        assert out[0][3] == 4.0 and out[0][4] == 1.0 and out[0][5] == 3.0
        assert out[0][6] == 2 and sorted(out[0][7]) == [1.0, 3.0]

    def test_struct_schema(self, spark):
        import polars_net_spark as pl

        d = pl.from_records([(1, "x")], ["a", "b"]).lazy()
        row = d.select(pl.struct("a", "b", schema=["l", "r"]).alias("s"))._sdf.collect()[0]
        assert row["s"].asDict() == {"l": 1, "r": "x"}
        import pytest as _pt

        with _pt.raises(ValueError):
            pl.struct("a", "b", schema=["only"])

    def test_builtins_unshadowed_in_package(self, spark):
        # the polars-named shadows live on the package namespace only
        import polars_net_spark.exprs as e

        assert e.__builtins__ if isinstance(e.__builtins__, dict) else True
        assert not hasattr(e, "sum")  # exprs module namespace stays clean


def test_expr_any_all_aggregates(spark):
    import polars_net_spark as pl
    from polars_net_spark import col

    sdf = pl.get_spark().createDataFrame(
        [("a", True), ("a", None), ("b", False), ("b", None), ("c", True), ("c", False)],
        "k string, v boolean",
    )
    rows = sorted(
        pl.LazyFrame(sdf).group_by("k").agg(
            col("v").any().alias("any"), col("v").all().alias("all"),
            col("v").any(ignore_nulls=False).alias("anyk"),
            col("v").all(ignore_nulls=False).alias("allk"),
        ).collect().rows()
    )
    assert rows == [
        ("a", True, True, True, None),   # all-kleene: null present, rest true
        ("b", False, False, None, False),  # any-kleene: null could be true
        ("c", True, False, True, False),
    ]


class TestSortByAgg:
    def test_first_last_implode(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        rows = [("a", 3, 30.0), ("a", 1, 10.0), ("a", 2, None), ("b", 5, 50.0), ("b", 4, 40.0)]
        d = pl.from_records(rows, ["g", "t", "v"]).lazy()
        out = {
            r[0]: r[1:]
            for r in d.group_by("g")
            .agg(
                col("v").sort_by("t").first().alias("f"),
                col("v").sort_by("t").last().alias("l"),
                col("v").sort_by("t", descending=True).first().alias("fd"),
                col("v").sort_by("t").implode().alias("vals"),
            )
            .collect()
            .rows()
        }
        assert out["a"] == (10.0, 30.0, 30.0, [10.0, None, 30.0])
        assert out["b"] == (40.0, 50.0, 50.0, [40.0, 50.0])

    def test_nulls_placement_and_mixed_directions(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        rows = [("a", 3, 30.0), ("a", 1, 10.0), ("a", 2, None)]
        d = pl.from_records(rows, ["g", "t", "v"]).lazy()
        out = d.group_by("g").agg(
            col("v").sort_by("v").implode().alias("nf"),
            col("v").sort_by("v", nulls_last=True).implode().alias("nl"),
            col("t").sort_by("t", "v", descending=[False, True]).first().alias("m"),
        ).collect().rows()[0]
        assert out[1] == [None, 10.0, 30.0]   # polars nulls-first default
        assert out[2] == [10.0, 30.0, None]
        assert out[3] == 1

    def test_string_key_is_column_not_literal(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        # regression: _c("t") falls back to F.lit — sort_by must treat bare
        # strings as column names (min_by over a constant key picks arbitrarily)
        rows = [("a", 2, 20.0), ("a", 1, 10.0)] * 50
        d = pl.from_records(rows, ["g", "t", "v"]).lazy()
        out = d.group_by("g").agg(col("v").sort_by("t").first().alias("f")).collect().rows()
        assert out == [("a", 10.0)]

    def test_order_insensitive_aggs_unaffected(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        d = pl.from_records([("a", 1, 10.0), ("a", 2, 30.0)], ["g", "t", "v"]).lazy()
        out = d.group_by("g").agg(col("v").sort_by("t").sum().alias("s")).collect().rows()
        assert out == [("a", 40.0)]
