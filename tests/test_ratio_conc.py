"""Tests for ratio_ttest and concentration_report (q265-q266 operators)."""

import math

import pytest

from polars_net_spark.operators.analytics import concentration_report
from polars_net_spark.operators.regression import ratio_ttest


def rows(lf):
    return lf.collect().rows()


class TestRatioTtest:
    def test_ratio_of_sums_and_delta_se(self, spark):
        # control: (x, y) = (1, 10), (3, 10); treatment: (2, 10), (6, 10)
        data = [("c", 1.0, 10.0), ("c", 3.0, 10.0),
                ("t", 2.0, 10.0), ("t", 6.0, 10.0)]
        df = spark.createDataFrame(data, "g string, x double, y double")
        out = rows(ratio_ttest(df, "x", "y", "g", "t"))[0]
        n_c, n_t, rc, rt, se_c, se_t, diff, se, z = out
        assert (n_c, n_t) == (2, 2)
        assert rc == pytest.approx(0.2) and rt == pytest.approx(0.4)
        assert diff == pytest.approx(0.2)
        # constant y: var reduces to var(x)/(n*ybar^2) = 2/(2*100)
        assert se_c == pytest.approx(math.sqrt(2 / 200), abs=1e-6)
        assert se_t == pytest.approx(math.sqrt(8 / 200), abs=1e-6)
        assert z == pytest.approx(diff / math.sqrt(2 / 200 + 8 / 200), abs=1e-4)

    def test_null_rows_drop_and_zero_denominator(self, spark):
        data = [("c", 1.0, 0.0), ("c", 1.0, 0.0), ("t", 1.0, 2.0),
                ("t", None, 2.0), ("t", 1.0, 2.0)]
        df = spark.createDataFrame(data, "g string, x double, y double")
        out = rows(ratio_ttest(df, "x", "y", "g", "t"))[0]
        assert out[0] == 2 and out[1] == 2  # the null-x row dropped
        assert out[2] is None  # control mean y = 0 -> null ratio


class TestConcentration:
    def test_uniform_shares(self, spark):
        df = spark.createDataFrame(
            [(k, 10.0) for k in "abcd"], "k string, v double"
        )
        out = rows(concentration_report(df, "k", "v", top_k=2))[0]
        n, hhi, hhi_n, ent, t1, t2 = out
        assert n == 4
        assert hhi == pytest.approx(0.25)
        assert hhi_n == pytest.approx(0.0)  # perfectly even
        assert ent == pytest.approx(2.0)    # log2(4)
        assert t1 == pytest.approx(0.25) and t2 == pytest.approx(0.5)

    def test_monopoly(self, spark):
        df = spark.createDataFrame(
            [("a", 100.0), ("b", 0.0)], "k string, v double"
        )
        out = rows(concentration_report(df, "k", "v"))[0]
        # zero-mass key drops: a single key with full mass
        assert out[0] == 1 and out[1] == pytest.approx(1.0)
        assert out[2] == pytest.approx(1.0)  # n=1 -> normalized 1 by contract
        assert out[3] == pytest.approx(0.0)
        assert out[4] == pytest.approx(1.0)

    def test_rows_collapse_to_keys(self, spark):
        df = spark.createDataFrame(
            [("a", 30.0), ("a", 20.0), ("b", 50.0)], "k string, v double"
        )
        out = rows(concentration_report(df, "k", "v"))[0]
        assert out[0] == 2 and out[1] == pytest.approx(0.5)
