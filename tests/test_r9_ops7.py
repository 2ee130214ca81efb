"""Round-9 batch 8: rdd_estimate, stratified_ate, weighted_mean_report,
yules_k."""
import math

import pytest

from polars_net_spark.llm.text import yules_k
from polars_net_spark.operators.regression import (
    rdd_estimate,
    stratified_ate,
    weighted_mean_report,
)


def rows(lf):
    return [tuple(r) for r in lf.spark.collect()]


class TestRdd:
    def test_recovers_known_jump(self, spark):
        import numpy as np

        rng = np.random.RandomState(3)
        x = rng.uniform(-2, 2, 8000)
        jump = 5.0
        y = 1.0 + 0.8 * x + jump * (x >= 0) + rng.randn(8000) * 0.5
        d = spark.createDataFrame(
            [(float(x[i]), float(y[i])) for i in range(8000)],
            "x double, y double",
        )
        (eff, se, z, al, ar, bl, br, nl, nr), = rows(
            rdd_estimate(d, "x", "y", cutoff=0.0, bandwidth=1.0)
        )
        assert abs(eff - jump) < 3 * se and abs(eff - jump) < 0.2
        assert z > 20 and abs(bl - 0.8) < 0.25 and abs(br - 0.8) < 0.25

    def test_no_jump_small_effect(self, spark):
        import numpy as np

        rng = np.random.RandomState(5)
        x = rng.uniform(-1, 1, 6000)
        y = 2.0 + x + rng.randn(6000) * 0.3
        d = spark.createDataFrame(
            [(float(x[i]), float(y[i])) for i in range(6000)],
            "x double, y double",
        )
        (eff, se, z, *_), = rows(rdd_estimate(d, "x", "y", 0.0, 1.0))
        assert abs(z) < 4

    def test_validation(self, spark):
        d = spark.createDataFrame([(0.5, 1.0)], "x double, y double")
        with pytest.raises(ValueError, match="fewer than 3"):
            rdd_estimate(d, "x", "y", 0.0, 1.0)


class TestStratifiedAte:
    def test_confounded_data_recovered(self, spark):
        # treatment prob rises with score; outcome = 2*treat + 3*score
        import numpy as np

        rng = np.random.RandomState(7)
        s = rng.rand(20000)
        t = (rng.rand(20000) < s).astype(int)
        y = 2.0 * t + 3.0 * s + rng.randn(20000) * 0.4
        d = spark.createDataFrame(
            [(float(y[i]), int(t[i]), float(s[i])) for i in range(20000)],
            "y double, t int, s double",
        )
        # naive diff is badly biased upward
        naive = y[t == 1].mean() - y[t == 0].mean()
        assert naive > 2.8
        (ate, se, n, used, ds, dr), = rows(
            stratified_ate(d, "y", "t", "s", n_strata=10)
        )
        assert abs(ate - 2.0) < 0.15 and used >= 9

    def test_missing_arm_dropped(self, spark):
        data = [(1.0, 1, 0.95)] * 10 + [(0.0, 0, 0.05)] * 10
        d = spark.createDataFrame(data, "y double, t int, s double")
        with pytest.raises(ValueError, match="no stratum"):
            stratified_ate(d, "y", "t", "s", n_strata=5)


class TestWeightedMean:
    def test_matches_numpy(self, spark):
        import numpy as np

        rng = np.random.RandomState(9)
        x = rng.randn(500) * 3 + 10
        w = rng.rand(500) * 5 + 0.1
        d = spark.createDataFrame(
            [(float(x[i]), float(w[i])) for i in range(500)],
            "x double, w double",
        )
        (wm, se, n, neff, deff, wv), = rows(weighted_mean_report(d, "x", "w"))
        ref_mean = np.average(x, weights=w)
        assert abs(wm - ref_mean) < 1e-6
        ref_neff = w.sum() ** 2 / (w ** 2).sum()
        assert abs(neff - ref_neff) < 1e-4
        ref_se = math.sqrt((w ** 2 * (x - ref_mean) ** 2).sum()) / w.sum()
        assert abs(se - ref_se) < 1e-6

    def test_equal_weights_deff_one(self, spark):
        d = spark.createDataFrame(
            [(float(i), 2.0) for i in range(100)], "x double, w double"
        )
        (wm, se, n, neff, deff, wv), = rows(weighted_mean_report(d, "x", "w"))
        assert deff == 1.0 and neff == 100.0 and wm == 49.5


class TestYulesK:
    def test_matches_brute_force(self, spark):
        texts = ["the cat sat on the mat", "the dog ate the cat food"]
        from collections import Counter

        c = Counter(w for t in texts for w in t.lower().split())
        N = sum(c.values())
        spec = Counter(c.values())
        m2v = sum(m * m * vm for m, vm in spec.items())
        k_ref = 1e4 * (m2v - N) / (N * N)
        d = spark.createDataFrame([(t,) for t in texts], "text string")
        (k, n, types, hapax, hs), = rows(yules_k(d, "text"))
        assert n == N and types == len(c)
        assert hapax == sum(1 for v in c.values() if v == 1)
        assert abs(k - k_ref) < 1e-6

    def test_repetitive_higher_than_diverse(self, spark):
        rep = spark.createDataFrame(
            [("buy now " * 50,)], "text string"
        )
        div = spark.createDataFrame(
            [(" ".join(f"w{i}" for i in range(100)),)], "text string"
        )
        (k_rep, *_), = rows(yules_k(rep, "text"))
        (k_div, *_), = rows(yules_k(div, "text"))
        assert k_rep > 1000 and k_div < 1
