"""Round-9 batch 6: bfs_distances, weibull_fit, chapman_estimate."""
import math

import pytest

from polars_net_spark.operators.analytics import chapman_estimate, weibull_fit
from polars_net_spark.operators.graph import bfs_distances


def rows(lf):
    return [tuple(r) for r in lf.spark.collect()]


class TestBfs:
    def test_chain_distances(self, spark):
        e = spark.createDataFrame([(i, i + 1) for i in range(6)], "src int, dst int")
        out = dict(rows(bfs_distances(e, [0])))
        assert out == {i: i for i in range(7)}

    def test_multi_source_min(self, spark):
        e = spark.createDataFrame([(i, i + 1) for i in range(10)], "src int, dst int")
        out = dict(rows(bfs_distances(e, [0, 10])))
        assert out[5] == 5 and out[8] == 2 and out[10] == 0

    def test_unreached_absent(self, spark):
        e = spark.createDataFrame([(1, 2), (5, 6)], "src int, dst int")
        out = dict(rows(bfs_distances(e, [1])))
        assert out == {1: 0, 2: 1}

    def test_max_rounds_raises(self, spark):
        e = spark.createDataFrame([(i, i + 1) for i in range(30)], "src int, dst int")
        with pytest.raises(RuntimeError, match="converge"):
            bfs_distances(e, [0], max_rounds=3)


class TestWeibull:
    def test_recovers_known_params(self, spark):
        import numpy as np

        rng = np.random.RandomState(19)
        k_true, lam_true = 1.8, 40.0
        x = lam_true * rng.weibull(k_true, 20000)
        d = spark.createDataFrame([(float(v),) for v in x], "v double").repartition(9)
        (k, lam, r2, n, nexc), = rows(weibull_fit(d, "v"))
        assert abs(k - k_true) < 0.1 and abs(lam - lam_true) < 1.5
        assert r2 > 0.98 and n == 20000 and nexc == 0

    def test_matches_brute_force(self, spark):
        import numpy as np

        x = np.array([3.0, 7.0, 7.0, 12.0, 20.0, 33.0, 33.0, 50.0])
        n = len(x)
        xs = np.sort(x)
        lx = np.log(xs)
        F_ = (np.arange(1, n + 1) - 0.3) / (n + 0.4)
        y = np.log(-np.log(1 - F_))
        A = np.vstack([lx, np.ones(n)]).T
        slope, inter = np.linalg.lstsq(A, y, rcond=None)[0]
        d = spark.createDataFrame([(float(v),) for v in x], "v double")
        (k, lam, r2, nn, nexc), = rows(weibull_fit(d, "v"))
        assert abs(k - slope) < 1e-6
        assert abs(lam - math.exp(-inter / slope)) < 1e-4

    def test_nonpositive_excluded(self, spark):
        d = spark.createDataFrame(
            [(0.0,), (-1.0,), (1.0,), (2.0,), (3.0,)], "v double"
        )
        (k, lam, r2, n, nexc), = rows(weibull_fit(d, "v"))
        assert n == 3 and nexc == 2


class TestChapman:
    def test_textbook_example(self, spark):
        # n_a=10 keys, n_b=8 keys, overlap 4 -> N = 11*9/5 - 1 = 18.8
        data = [("a", k) for k in range(10)] + [("b", k) for k in range(6, 14)]
        d = spark.createDataFrame(data, "g string, k long")
        (na, nb, m, est, se), = rows(chapman_estimate(d, "k", "g", "a", "b"))
        assert (na, nb, m) == (10, 8, 4)
        assert abs(est - (11 * 9 / 5 - 1)) < 1e-9
        var = 11 * 9 * 6 * 4 / (25 * 6)
        assert abs(se - math.sqrt(var)) < 1e-6

    def test_duplicates_collapse(self, spark):
        data = [("a", 1)] * 50 + [("b", 1)] * 30 + [("b", 2)] * 3
        d = spark.createDataFrame(data, "g string, k long")
        (na, nb, m, est, se), = rows(chapman_estimate(d, "k", "g", "a", "b"))
        assert (na, nb, m) == (1, 2, 1)
