"""fe_regression + best_changepoint (operators/regression.py)."""

import math

import pytest

from polars_net_spark.operators.regression import best_changepoint, fe_regression


def rows(lf):
    return lf.collect().rows()


class TestFeRegression:
    def test_one_way_matches_demeaned_ols(self, spark):
        import numpy as np

        rng = np.random.RandomState(4)
        units = np.repeat(np.arange(20), 15)
        alpha = rng.randn(20) * 5.0               # unit effects
        x = rng.randn(300) + alpha[units] * 0.5   # x correlated with effects
        y = 2.0 * x + alpha[units] + rng.randn(300) * 0.3
        d = spark.createDataFrame(
            [(int(u), float(a), float(b)) for u, a, b in zip(units, x, y)],
            "u long, x double, y double",
        ).repartition(7)
        (beta, se, tstat, n, nu), = rows(fe_regression(d, "y", "x", "u"))
        # numpy within-estimator reference
        xd = x - np.array([x[units == u].mean() for u in units])
        yd = y - np.array([y[units == u].mean() for u in units])
        ref = float((xd * yd).sum() / (xd**2).sum())
        assert abs(beta - ref) < 1e-6 and n == 300 and nu == 20
        sse = float((yd**2).sum() - ref * (xd * yd).sum())
        ref_se = math.sqrt(sse / (300 - 20 - 1) / float((xd**2).sum()))
        assert abs(se - ref_se) < 1e-6

    def test_two_way_recovers_beta(self, spark):
        import numpy as np

        rng = np.random.RandomState(9)
        n_u, n_t = 15, 12
        u = np.repeat(np.arange(n_u), n_t)
        t = np.tile(np.arange(n_t), n_u)
        au, gt = rng.randn(n_u) * 3, rng.randn(n_t) * 2
        x = rng.randn(n_u * n_t) + au[u] * 0.4 + gt[t] * 0.3
        y = -1.5 * x + au[u] + gt[t] + rng.randn(n_u * n_t) * 0.05
        d = spark.createDataFrame(
            [(int(a), int(b), float(c), float(e)) for a, b, c, e in zip(u, t, x, y)],
            "u long, t long, x double, y double",
        )
        (beta, se, tstat, n, nu, nt), = rows(fe_regression(d, "y", "x", "u", "t"))
        assert abs(beta + 1.5) < 0.02 and nu == n_u and nt == n_t

    def test_no_within_variation_raises(self, spark):
        d = spark.createDataFrame(
            [(1, 5.0, 1.0), (1, 5.0, 2.0), (2, 3.0, 9.0), (2, 3.0, 8.0)],
            "u long, x double, y double",
        )
        with pytest.raises(ValueError, match="within-variation"):
            fe_regression(d, "y", "x", "u")


class TestBestChangepoint:
    def test_clean_shift(self, spark):
        data = [(float(i), 1.0) for i in range(50)] + [
            (float(i), 5.0) for i in range(50, 100)
        ]
        d = spark.createDataFrame(data, "t double, v double").repartition(6)
        (split, nl, nr, ml, mr, drop), = rows(best_changepoint(d, "t", "v"))
        assert split == 49.0 and nl == 50 and nr == 50
        assert ml == 1.0 and mr == 5.0
        # gain = n_l*n_r/n * (diff)^2 = 50*50/100*16 = 400
        assert abs(drop - 400.0) < 1e-6

    def test_matches_bruteforce(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        v = np.concatenate([rng.randn(37) + 1.0, rng.randn(63) + 2.2]).round(4)
        d = spark.createDataFrame(
            [(float(i), float(x)) for i, x in enumerate(v)], "t double, v double"
        ).repartition(5)
        (split, nl, nr, ml, mr, drop), = rows(best_changepoint(d, "t", "v"))
        n = len(v)
        best = None
        tot_sse = ((v - v.mean()) ** 2).sum()
        for s in range(2, n - 1):
            l, r = v[:s], v[s:]
            gain = tot_sse - ((l - l.mean()) ** 2).sum() - ((r - r.mean()) ** 2).sum()
            if best is None or gain > best[0] + 1e-12:
                best = (gain, s)
        assert nl == best[1]
        assert abs(drop - best[0]) < 1e-4

    def test_min_segment_and_small_input(self, spark):
        d = spark.createDataFrame(
            [(1.0, 1.0), (2.0, 9.0)], "t double, v double"
        )
        with pytest.raises(ValueError, match="needs >="):
            best_changepoint(d, "t", "v", min_segment=2)
        (split, nl, nr, *_), = rows(best_changepoint(d, "t", "v", min_segment=1))
        assert nl == 1 and nr == 1
