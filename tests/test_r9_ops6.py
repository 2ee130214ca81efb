"""Round-9 batch 7: partial_corr, distribution_compare, negbin_fit,
eb_shrunk_rates."""
import math

import pytest

from polars_net_spark.operators.analytics import eb_shrunk_rates
from polars_net_spark.operators.regression import (
    distribution_compare,
    negbin_fit,
    partial_corr,
)


def rows(lf):
    return [tuple(r) for r in lf.spark.collect()]


class TestPartialCorr:
    def test_confounder_vanishes(self, spark):
        # x and y both driven by z; partial_r should collapse toward 0
        import numpy as np

        rng = np.random.RandomState(3)
        z = rng.randn(3000)
        x = 2 * z + rng.randn(3000) * 0.5
        y = -3 * z + rng.randn(3000) * 0.5
        d = spark.createDataFrame(
            [(float(x[i]), float(y[i]), float(z[i])) for i in range(3000)],
            "x double, y double, z double",
        )
        (pr, rxy, rxz, ryz, n), = rows(partial_corr(d, "x", "y", "z"))
        assert abs(rxy) > 0.8 and abs(pr) < 0.08

    def test_matches_numpy(self, spark):
        import numpy as np

        rng = np.random.RandomState(5)
        x, y, z = rng.randn(200), rng.randn(200), rng.randn(200)
        y = y + 0.5 * x
        c = np.corrcoef(np.vstack([x, y, z]))
        rxy, rxz, ryz = c[0, 1], c[0, 2], c[1, 2]
        ref = (rxy - rxz * ryz) / math.sqrt((1 - rxz ** 2) * (1 - ryz ** 2))
        d = spark.createDataFrame(
            [(float(x[i]), float(y[i]), float(z[i])) for i in range(200)],
            "x double, y double, z double",
        )
        (pr, *_ , n), = rows(partial_corr(d, "x", "y", "z"))
        assert abs(pr - ref) < 1e-6


class TestDistributionCompare:
    def test_lognormal_wins_on_lognormal(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        x = np.exp(rng.randn(5000) * 0.8 + 1.0)
        d = spark.createDataFrame([(float(v),) for v in x], "v double")
        (r,) = rows(distribution_compare(d, "v"))
        assert r[-1] == "lognormal"

    def test_normal_wins_on_normal(self, spark):
        import numpy as np

        rng = np.random.RandomState(8)
        x = rng.randn(5000) * 2 + 50
        d = spark.createDataFrame([(float(v),) for v in x], "v double")
        (r,) = rows(distribution_compare(d, "v"))
        assert r[-1] == "normal" and r[1] == 0

    def test_exponential_wins_on_exponential(self, spark):
        import numpy as np

        rng = np.random.RandomState(9)
        x = rng.exponential(3.0, 5000)
        d = spark.createDataFrame([(float(v),) for v in x], "v double")
        (r,) = rows(distribution_compare(d, "v"))
        assert r[-1] == "exponential"

    def test_loglik_matches_manual(self, spark):
        import numpy as np

        x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        n = len(x)
        var = x.var()
        ll_n = -n / 2 * (math.log(2 * math.pi * var) + 1)
        d = spark.createDataFrame([(float(v),) for v in x], "v double")
        (r,) = rows(distribution_compare(d, "v"))
        assert abs(r[2] - ll_n) < 1e-6


class TestNegbin:
    def test_recovers_known_params(self, spark):
        import numpy as np

        rng = np.random.RandomState(11)
        r_true, p_true = 3.0, 0.4
        x = rng.negative_binomial(r_true, p_true, 20000)
        d = spark.createDataFrame([(int(v),) for v in x], "v long")
        (n, m, var, disp, r, p), = rows(negbin_fit(d, "v"))
        assert abs(r - r_true) < 0.3 and abs(p - p_true) < 0.03
        assert disp > 2

    def test_underdispersed_raises(self, spark):
        d = spark.createDataFrame([(5,)] * 50 + [(6,)] * 50, "v long")
        with pytest.raises(ValueError, match="overdispersed"):
            negbin_fit(d, "v")


class TestEbShrunk:
    def test_small_samples_shrink_harder(self, spark):
        import numpy as np

        rng = np.random.RandomState(13)
        data = []
        # population of keys with true rates ~ Beta(4, 16) (mean .2)
        for k in range(200):
            tr = rng.beta(4, 16)
            nn = rng.randint(5, 200)
            for _ in range(nn):
                data.append((k, int(rng.rand() < tr)))
        d = spark.createDataFrame(data, "k long, y int")
        out = {r[0]: r for r in rows(eb_shrunk_rates(d, "k", "y"))}
        alpha, beta = out[0][5], out[0][6]
        prior_mean = alpha / (alpha + beta)
        assert 0.1 < prior_mean < 0.3
        # every key's eb rate sits between its raw rate and the prior mean
        for k, r in out.items():
            raw, eb = r[3], r[4]
            lo, hi = min(raw, prior_mean), max(raw, prior_mean)
            assert lo - 1e-6 <= eb <= hi + 1e-6

    def test_shrink_magnitude_ordering(self, spark):
        # same raw rate, different n: small n ends closer to prior
        data = [(1, 1), (1, 0)] * 2 + [(2, 1), (2, 0)] * 100
        data += [(k + 10, i % 5 == 0) for k in range(20) for i in range(30)]
        d = spark.createDataFrame(
            [(k, int(y)) for k, y in data], "k long, y int"
        )
        out = {r[0]: r for r in rows(eb_shrunk_rates(d, "k", "y"))}
        alpha, beta = out[1][5], out[1][6]
        pm = alpha / (alpha + beta)
        assert abs(out[1][4] - pm) < abs(out[2][4] - pm)

    def test_zero_variance_raises(self, spark):
        d = spark.createDataFrame(
            [(k, i % 2) for k in range(10) for i in range(10)], "k long, y int"
        )
        with pytest.raises(ValueError, match="zero variance"):
            eb_shrunk_rates(d, "k", "y")
