"""Tests for forecast_accuracy, fk_integrity_report, theil_sen_by_key
(q268-q270 operators)."""

import math

import pytest

from polars_net_spark.operators.regression import forecast_accuracy, theil_sen_by_key
from polars_net_spark.operators.validate import fk_integrity_report


def rows(lf):
    return lf.collect().rows()


class TestForecastAccuracy:
    def test_metrics(self, spark):
        df = spark.createDataFrame(
            [(10.0, 12.0), (20.0, 18.0), (0.0, 0.0)], "a double, p double"
        )
        n, mae, rmse, mape, n_mape, smape, bias = rows(
            forecast_accuracy(df, "a", "p")
        )[0]
        assert n == 3
        assert mae == pytest.approx(4 / 3, abs=1e-6)
        assert rmse == pytest.approx(math.sqrt(8 / 3), abs=1e-6)
        assert mape == pytest.approx(0.15) and n_mape == 2
        assert smape == pytest.approx((2 * 2 / 22 + 2 * 2 / 38 + 0) / 3, abs=1e-6)
        assert bias == pytest.approx(0.0)

    def test_per_key_and_null_drop(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 2.0), ("a", 1.0, None), ("b", 4.0, 4.0)],
            "k string, a double, p double",
        )
        out = {r[0]: r for r in rows(forecast_accuracy(df, "a", "p", by="k"))}
        assert out["a"][1] == 1 and out["a"][2] == 1.0
        assert out["b"][2] == 0.0


class TestFkIntegrity:
    def test_counts(self, spark):
        c = spark.createDataFrame([(1,), (1,), (2,), (9,), (None,)], "k long")
        p = spark.createDataFrame([(1,), (2,), (3,)], "k long")
        out = rows(fk_integrity_report(c, p, "k"))[0]
        assert out == (5, 1, 1, 1, 3, 1)

    def test_clean_reference(self, spark):
        c = spark.createDataFrame([(1,), (2,)], "k long")
        p = spark.createDataFrame([(1,), (2,)], "k long")
        assert rows(fk_integrity_report(c, p, "k"))[0] == (2, 0, 0, 0, 2, 0)

    def test_different_key_names_and_composite(self, spark):
        c = spark.createDataFrame([(1, "x"), (2, "y")], "a long, b string")
        p = spark.createDataFrame([(1, "x")], "pa long, pb string")
        out = rows(fk_integrity_report(c, p, ["a", "b"], ["pa", "pb"]))[0]
        assert out[2] == 1 and out[4] == 1


class TestTheilSen:
    def test_outlier_robust(self, spark):
        pts = [("k", float(x), 2.0 * x + 1.0) for x in range(1, 8)]
        pts.append(("k", 4.5, 100.0))  # gross outlier
        df = spark.createDataFrame(pts, "k string, x double, y double")
        out = rows(theil_sen_by_key(df, "x", "y", by="k"))[0]
        assert out[1] == 8
        assert out[2] == pytest.approx(2.0, abs=1e-6)
        assert out[3] == pytest.approx(1.0, abs=1e-6)

    def test_even_pair_count_median(self, spark):
        # 3 collinear points -> 3 slopes (odd); 4 points -> 6 slopes (even)
        pts = [("k", 1.0, 1.0), ("k", 2.0, 3.0), ("k", 3.0, 4.0), ("k", 4.0, 7.0)]
        df = spark.createDataFrame(pts, "k string, x double, y double")
        out = rows(theil_sen_by_key(df, "x", "y", by="k"))[0]
        # pairwise slopes sorted: [1, 1.5, 2, 2, 2, 3] -> median (2+2)/2
        assert out[2] == pytest.approx(2.0, abs=1e-6)

    def test_vertical_pairs_skip_and_short_series(self, spark):
        df = spark.createDataFrame(
            [("k", 1.0, 1.0), ("k", 1.0, 5.0), ("k", 2.0, 2.0),
             ("s", 3.0, 3.0)],
            "k string, x double, y double",
        )
        out = {r[0]: r for r in rows(theil_sen_by_key(df, "x", "y", by="k"))}
        assert out["k"][2] is not None  # the two x=1 points pair is skipped
        assert out["s"][2] is None and out["s"][3] is None
