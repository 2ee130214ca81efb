"""qini_curve (mleval.py), huber_fit + poisson_rate_test (regression.py)."""

import math

import pytest

from polars_net_spark.operators.mleval import qini_curve
from polars_net_spark.operators.regression import huber_fit, poisson_rate_test


def rows(lf):
    return lf.collect().rows()


class TestQini:
    def test_perfect_uplift_model(self, spark):
        # top half: treatment converts (y=1 treated, 0 control);
        # bottom half: nobody converts.  score = uplift truth.
        data = []
        for i in range(200):
            hi = i < 100
            t = i % 2
            y = 1.0 if (hi and t == 1) else 0.0
            data.append((float(200 - i), i, float(t), y))
        d = spark.createDataFrame(data, "s double, id long, t double, y double").repartition(6)
        out = sorted(rows(qini_curve(d, "s", "t", "y", "id", n_buckets=4)))
        # after 2 of 4 buckets (the whole top half): yt=50, yc=0, nt=nc=50
        b1 = out[1]
        assert b1[0] == 1
        # cumulative at bucket 1: qini = 50 - 0*... = 50, uplift = 1.0
        assert abs(b1[5] - 50.0) < 1e-9 and abs(b1[6] - 1.0) < 1e-9
        # final bucket: totals unchanged -> qini still 50
        assert abs(out[3][5] - 50.0) < 1e-9 and abs(out[3][6] - 0.5) < 1e-9

    def test_reference_pandas(self, spark):
        import numpy as np

        rng = np.random.RandomState(8)
        n = 500
        s = rng.rand(n).round(4)
        t = (rng.rand(n) < 0.5).astype(float)
        y = (rng.rand(n) < 0.2 + 0.3 * s * t).astype(float)
        ids = np.arange(n)
        d = spark.createDataFrame(
            [(float(a), int(i), float(b), float(c)) for a, i, b, c in zip(s, ids, t, y)],
            "s double, id long, t double, y double",
        ).repartition(9)
        out = {r[0]: r for r in rows(qini_curve(d, "s", "t", "y", "id", n_buckets=5))}
        order = np.lexsort((ids, -s))
        st, sy = t[order], y[order]
        k, nn = 5, n
        for b in range(5):
            hi = (b + 1) * nn // k  # exact slice rule: floor((rank-1)k/n)==b
            # rows with floor((r-1)*k/n) <= b  <=> r <= ceil((b+1)*n/k)
            hi = math.ceil((b + 1) * nn / k)
            ct, cc = st[:hi].sum(), (1 - st[:hi]).sum()
            yt = (st[:hi] * sy[:hi]).sum()
            yc = ((1 - st[:hi]) * sy[:hi]).sum()
            qini = yt - yc * ct / cc
            assert abs(out[b][5] - qini) < 1e-6, b


class TestHuber:
    def test_outlier_resistance(self, spark):
        # y = 2x + 1 with 3 gross outliers; OLS would tilt, Huber shouldn't
        data = [(float(x), 2.0 * x + 1.0) for x in range(50)]
        data += [(5.0, 500.0), (10.0, 400.0), (15.0, 900.0)]
        d = spark.createDataFrame(data, "x double, y double").repartition(5)
        (slope, intercept, n, it, delta), = rows(huber_fit(d, "x", "y", delta=1.0, iterations=8))
        assert n == 53
        assert abs(slope - 2.0) < 0.1 and abs(intercept - 1.0) < 1.5

    def test_no_outliers_matches_ols(self, spark):
        import numpy as np

        rng = np.random.RandomState(2)
        x = rng.rand(200) * 10
        y = 3.0 * x - 2.0 + rng.randn(200) * 0.01  # tiny noise, all inliers
        d = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
        )
        (slope, intercept, *_), = rows(huber_fit(d, "x", "y", delta=10.0, iterations=3))
        bref, aref = np.polyfit(x, y, 1)
        assert abs(slope - bref) < 1e-4 and abs(intercept - aref) < 1e-4

    def test_guards(self, spark):
        d = spark.createDataFrame([(1.0, 1.0)], "x double, y double")
        with pytest.raises(ValueError):
            huber_fit(d, "x", "y", delta=0)
        with pytest.raises(ValueError, match="at least 2"):
            huber_fit(d, "x", "y")
        d2 = spark.createDataFrame([(1.0, 1.0), (1.0, 2.0)], "x double, y double")
        with pytest.raises(ValueError, match="variance"):
            huber_fit(d2, "x", "y")


class TestPoissonRate:
    def test_known_rates(self, spark):
        # arm a: 30 events over 10 units; arm b: 10 over 10
        data = [("a", 3.0, 1.0)] * 10 + [("b", 1.0, 1.0)] * 10
        d = spark.createDataFrame(data, "g string, c double, e double")
        (na, nb, ra, rb, diff, zs, ratio, lo, hi), = rows(
            poisson_rate_test(d, "c", "e", "g", "a", "b")
        )
        assert na == nb == 10 and ra == 3.0 and rb == 1.0 and ratio == 3.0
        ref_z = (3.0 - 1.0) / math.sqrt(30 / 100 + 10 / 100)
        assert abs(zs - ref_z) < 1e-6
        se = math.sqrt(1 / 30 + 1 / 10)
        assert abs(lo - math.exp(math.log(3.0) - 1.96 * se)) < 1e-6
        assert abs(hi - math.exp(math.log(3.0) + 1.96 * se)) < 1e-6

    def test_zero_count_null_ci(self, spark):
        d = spark.createDataFrame(
            [("a", 0.0, 5.0), ("b", 2.0, 5.0)], "g string, c double, e double"
        )
        (_, _, ra, rb, diff, zs, ratio, lo, hi), = rows(
            poisson_rate_test(d, "c", "e", "g", "a", "b")
        )
        assert ra == 0.0 and ratio == 0.0 and lo is None and hi is None

    def test_zero_exposure_raises(self, spark):
        d = spark.createDataFrame([("a", 1.0, 0.0), ("b", 1.0, 1.0)],
                                  "g string, c double, e double")
        with pytest.raises(ValueError, match="exposure"):
            poisson_rate_test(d, "c", "e", "g", "a", "b")
