"""Round-9 batch 9: holt_winters, mediation_report."""
import math

import pytest

from polars_net_spark.operators.analytics import holt_winters
from polars_net_spark.operators.regression import mediation_report


def rows(lf):
    return [tuple(r) for r in lf.spark.collect()]


def hw_ref(xs, m, a, b, g, h):
    l = sum(xs[:m]) / m
    bb = (sum(xs[m:2 * m]) / m - sum(xs[:m]) / m) / m
    s = [x - l for x in xs[:m]]
    for t in range(m, len(xs)):
        x = xs[t]
        s_old = s[0]
        l_new = a * (x - s_old) + (1 - a) * (l + bb)
        bb = b * (l_new - l) + (1 - b) * bb
        s = s[1:] + [g * (x - l_new) + (1 - g) * s_old]
        l = l_new
    return l, bb, s[(h - 1) % m], l + h * bb + s[(h - 1) % m]


class TestHoltWinters:
    def test_matches_reference_fold(self, spark):
        import random

        rng = random.Random(3)
        xs = [10 + 0.2 * t + [5, -3, 1, -2, 4, -5, 0][t % 7] + rng.random()
              for t in range(60)]
        ref = hw_ref(xs, 7, 0.3, 0.1, 0.1, 3)
        d = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "t int, v double"
        ).repartition(5)
        (row,) = rows(holt_winters(d, "v", "t", period=7, horizon=3))
        assert all(abs(row[i + 1] - ref[i]) < 1e-6 for i in range(4))

    def test_perfect_seasonal_forecast(self, spark):
        # pure season + linear trend is forecast almost exactly
        pat = [10, -5, 3, -8]
        xs = [100 + 0.5 * t + pat[t % 4] for t in range(48)]
        d = spark.createDataFrame(
            [(i, float(x)) for i, x in enumerate(xs)], "t int, v double"
        )
        (row,) = rows(
            holt_winters(d, "v", "t", period=4, alpha=0.8, beta=0.5,
                         gamma=0.5, horizon=1)
        )
        truth = 100 + 0.5 * 48 + pat[48 % 4]
        assert abs(row[4] - truth) < 0.5

    def test_short_series_nulls(self, spark):
        d = spark.createDataFrame(
            [(i, float(i)) for i in range(7)], "t int, v double"
        )
        (row,) = rows(holt_winters(d, "v", "t", period=4))
        assert row[0] == 7 and row[1] is None and row[4] is None

    def test_keyed(self, spark):
        xs = [float(v) for v in range(20)]
        data = [("a", i, x) for i, x in enumerate(xs)] + [
            ("b", i, 2 * x) for i, x in enumerate(xs)
        ]
        d = spark.createDataFrame(data, "k string, t int, v double")
        out = {r[0]: r for r in rows(holt_winters(d, "v", "t", period=4, by="k"))}
        assert abs(out["b"][4] - 2 * out["a"][4]) < 1e-6

    def test_validation(self, spark):
        d = spark.createDataFrame([(1, 1.0)], "t int, v double")
        with pytest.raises(ValueError, match="period"):
            holt_winters(d, "v", "t", period=1)
        with pytest.raises(ValueError, match="alpha"):
            holt_winters(d, "v", "t", period=4, alpha=0.0)


class TestMediation:
    def test_recovers_paths(self, spark):
        import numpy as np

        rng = np.random.RandomState(11)
        n = 4000
        x = rng.randn(n)
        m = 0.6 * x + rng.randn(n) * 0.7
        y = 0.5 * m + 0.2 * x + rng.randn(n) * 0.5
        d = spark.createDataFrame(
            [(float(x[i]), float(m[i]), float(y[i])) for i in range(n)],
            "x double, m double, y double",
        )
        (r,) = rows(mediation_report(d, "x", "m", "y"))
        ind, se, z, a, b, cp, c, prop, nn = r
        assert abs(a - 0.6) < 0.05 and abs(b - 0.5) < 0.05
        assert abs(cp - 0.2) < 0.05 and z > 20
        assert abs(c - (a * b + cp)) < 1e-5  # identity c = ab + c' (6dp-rounded outputs)

    def test_no_mediation_small_z(self, spark):
        import numpy as np

        rng = np.random.RandomState(13)
        n = 3000
        x = rng.randn(n)
        m = rng.randn(n)                  # mediator unrelated to x
        y = 0.5 * x + rng.randn(n) * 0.5
        d = spark.createDataFrame(
            [(float(x[i]), float(m[i]), float(y[i])) for i in range(n)],
            "x double, m double, y double",
        )
        (r,) = rows(mediation_report(d, "x", "m", "y"))
        assert abs(r[2]) < 3  # sobel z small

    def test_validation(self, spark):
        d = spark.createDataFrame(
            [(1.0, 1.0, 1.0)] * 10, "x double, m double, y double"
        )
        with pytest.raises(ValueError, match="zero variance"):
            mediation_report(d, "x", "m", "y")


class TestLogisticFit:
    def test_matches_numpy_newton(self, spark):
        import numpy as np

        from polars_net_spark.operators.regression import logistic_fit

        rng = np.random.RandomState(5)
        n = 2000
        x = rng.randn(n)
        p = 1 / (1 + np.exp(-(-0.5 + 1.2 * x)))
        y = (rng.rand(n) < p).astype(int)
        a = b = 0.0
        for _ in range(6):
            pp = 1 / (1 + np.exp(-(a + b * x)))
            w = pp * (1 - pp)
            g0, g1 = (y - pp).sum(), ((y - pp) * x).sum()
            h00, h01, h11 = w.sum(), (w * x).sum(), (w * x * x).sum()
            det = h00 * h11 - h01 * h01
            a += (h11 * g0 - h01 * g1) / det
            b += (h00 * g1 - h01 * g0) / det
        d = spark.createDataFrame(
            [(float(x[i]), int(y[i])) for i in range(n)], "x double, y int"
        ).repartition(7)
        (r,) = [tuple(v) for v in logistic_fit(d, "x", "y").spark.collect()]
        assert abs(r[0] - a) < 1e-6 and abs(r[1] - b) < 1e-6

    def test_null_slope_on_noise(self, spark):
        from polars_net_spark.operators.regression import logistic_fit

        d = spark.createDataFrame(
            [(float(i % 10), int((i // 10) % 2)) for i in range(1000)],
            "x double, y int",
        )
        (r,) = [tuple(v) for v in logistic_fit(d, "x", "y").spark.collect()]
        assert abs(r[4]) < 2  # z_slope small

    def test_one_class_raises(self, spark):
        import pytest as _pt

        from polars_net_spark.operators.regression import logistic_fit

        d = spark.createDataFrame([(1.0, 1)] * 10, "x double, y int")
        with _pt.raises(ValueError, match="both classes"):
            logistic_fit(d, "x", "y")
