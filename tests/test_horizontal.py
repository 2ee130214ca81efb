"""Horizontal expression functions (polars pl.*_horizontal / fold family).

Parity extras beyond the reference surface (the reference has no horizontal
fold family — zero hits for sum_horizontal/fold in /root/reference); semantics
follow polars 1.x. All compile to pure Column arithmetic (no UDF).
"""

import math

import pytest

import polars_net_spark as pl
from polars_net_spark import col, lit


@pytest.fixture(scope="module")
def hframe(spark):
    return pl.from_records(
        [
            (1, 10.0, 2.0, 3.0),
            (2, None, 5.0, 1.0),
            (3, None, None, None),
            (4, 7.0, None, 2.0),
        ],
        ["id", "a", "b", "c"],
    ).lazy()


def _rows(lf, *exprs):
    out = lf.select(col("id"), *exprs).sort("id").collect().rows()
    return [r[1] for r in out]


class TestSumMean:
    def test_sum_ignore_nulls(self, hframe):
        got = _rows(hframe, pl.sum_horizontal("a", "b", "c").alias("s"))
        assert got == [15.0, 6.0, 0, 9.0]

    def test_sum_propagate_nulls(self, hframe):
        got = _rows(hframe, pl.sum_horizontal("a", "b", "c", ignore_nulls=False).alias("s"))
        assert got == [15.0, None, None, None]

    def test_mean_ignore_nulls(self, hframe):
        got = _rows(hframe, pl.mean_horizontal("a", "b", "c").alias("m"))
        assert got[0] == 5.0 and got[1] == 3.0 and got[2] is None and got[3] == 4.5

    def test_mean_propagate(self, hframe):
        got = _rows(hframe, pl.mean_horizontal("a", "b", "c", ignore_nulls=False).alias("m"))
        assert got == [5.0, None, None, None]


class TestMinMaxAnyAll:
    def test_min_max(self, hframe):
        mn = _rows(hframe, pl.min_horizontal("a", "b", "c").alias("mn"))
        mx = _rows(hframe, pl.max_horizontal("a", "b", "c").alias("mx"))
        assert mn == [2.0, 1.0, None, 2.0]
        assert mx == [10.0, 5.0, None, 7.0]

    def test_any_all(self, spark):
        lf = pl.from_records(
            [(1, True, None), (2, False, None), (3, True, False), (4, None, None)],
            ["id", "p", "q"],
        ).lazy()
        assert _rows(lf, pl.any_horizontal("p", "q").alias("x")) == [True, False, True, False]
        assert _rows(lf, pl.all_horizontal("p", "q").alias("x")) == [True, False, False, True]
        # Kleene (ignore_nulls=False): true|null=true, false|null=null
        assert _rows(lf, pl.any_horizontal("p", "q", ignore_nulls=False).alias("x")) == [
            True, None, True, None,
        ]
        assert _rows(lf, pl.all_horizontal("p", "q", ignore_nulls=False).alias("x")) == [
            None, False, False, None,
        ]

    def test_coalesce(self, hframe):
        got = _rows(hframe, pl.coalesce("a", "b", "c").alias("x"))
        assert got == [10.0, 5.0, None, 7.0]


class TestFold:
    def test_fold_sum(self, hframe):
        got = _rows(
            hframe,
            pl.fold(lit(0.0), lambda acc, x: acc + x.fill_null(0), ["a", "b", "c"]).alias("s"),
        )
        assert got == [15.0, 6.0, 0.0, 9.0]

    def test_reduce_max(self, hframe):
        got = _rows(
            hframe,
            pl.reduce(lambda acc, x: pl.max_horizontal(acc, x), ["a", "b", "c"]).alias("m"),
        )
        assert got == [10.0, 5.0, None, 7.0]

    def test_cum_fold_struct(self, hframe):
        out = (
            hframe.select(
                col("id"),
                pl.cum_fold(lit(0.0), lambda acc, x: acc + x.fill_null(0), ["a", "b"]).alias("cf"),
            )
            .sort("id")
            .collect()
            .rows()
        )
        first = out[0][1]
        assert first["a"] == 10.0 and first["b"] == 12.0

    def test_cum_reduce_struct(self, hframe):
        out = (
            hframe.select(
                col("id"),
                pl.cum_reduce(lambda acc, x: acc + x, ["a", "b"]).alias("cr"),
            )
            .sort("id")
            .collect()
            .rows()
        )
        assert out[0][1]["a"] == 10.0 and out[0][1]["b"] == 12.0
        assert out[1][1]["b"] is None  # null propagates through raw +

    def test_errors(self):
        with pytest.raises(ValueError):
            pl.sum_horizontal()
        with pytest.raises(ValueError):
            pl.reduce(lambda a, b: a + b, [])


class TestNoUDFPlan:
    def test_whole_stage_codegen(self, hframe):
        sdf = hframe.select(
            pl.sum_horizontal("a", "b", "c").alias("s"),
            pl.mean_horizontal("a", "b").alias("m"),
            pl.fold(lit(0.0), lambda a, x: a + x.fill_null(0), ["a", "c"]).alias("f"),
        ).spark
        txt = sdf._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt
