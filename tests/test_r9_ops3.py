"""Round-9 batch 3/4: kmeans_report, cramer_von_mises, permutation_test."""
import math

import pytest

from polars_net_spark.llm.similarity import kmeans_report
from polars_net_spark.operators.regression import cramer_von_mises, permutation_test


def rows(lf):
    return [tuple(r) for r in lf.spark.collect()]


class TestCvM:
    def test_matches_brute_force(self, spark):
        import numpy as np

        rng = np.random.RandomState(4)
        a = rng.randn(40).round(2)   # rounding forces some ties
        b = (rng.randn(35) + 0.7).round(2)
        # brute force with mid-ranks
        pooled = np.concatenate([a, b])
        order = np.argsort(pooled, kind="mergesort")
        ranks = np.empty(len(pooled))
        sv = pooled[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        ra = np.sort(ranks[: len(a)])
        rb = np.sort(ranks[len(a):])
        n, m = len(a), len(b)
        N = n + m
        U = n * ((ra - np.arange(1, n + 1)) ** 2).sum() + m * (
            (rb - np.arange(1, m + 1)) ** 2
        ).sum()
        T = U / (n * m * N) - (4 * n * m - 1) / (6 * N)
        d = spark.createDataFrame(
            [("a", float(v)) for v in a] + [("b", float(v)) for v in b],
            "g string, x double",
        ).repartition(5)
        (t, u, na, nb), = rows(cramer_von_mises(d, "x", "g", "a", "b"))
        assert na == n and nb == m
        assert abs(u - U) < 1e-6 and abs(t - T) < 1e-6

    def test_identical_small(self, spark):
        data = [("a", float(i % 20)) for i in range(200)] + [
            ("b", float(i % 20)) for i in range(200)
        ]
        d = spark.createDataFrame(data, "g string, x double")
        (t, u, na, nb), = rows(cramer_von_mises(d, "x", "g", "a", "b"))
        assert t < 0.2  # far below the 0.461 critical value

    def test_shifted_large(self, spark):
        data = [("a", float(i % 50)) for i in range(300)] + [
            ("b", float(i % 50) + 40) for i in range(300)
        ]
        d = spark.createDataFrame(data, "g string, x double")
        (t, u, na, nb), = rows(cramer_von_mises(d, "x", "g", "a", "b"))
        assert t > 10


class TestPermutation:
    def test_null_is_uniformish(self, spark):
        # same distribution in both groups -> p should not be tiny
        data = [(i, "a" if i % 2 == 0 else "b", float((i * 7) % 100)) for i in range(2000)]
        d = spark.createDataFrame(data, "id long, g string, x double")
        (obs, p, np_, used, ma, mb, na, nb), = rows(
            permutation_test(d, "x", "g", "id", "a", "b")
        )
        assert p > 0.05 and used == 64 and na == nb == 1000

    def test_strong_effect_min_p(self, spark):
        data = [(i, "a", float(100 + i % 5)) for i in range(500)] + [
            (i + 500, "b", float(i % 5)) for i in range(500)
        ]
        d = spark.createDataFrame(data, "id long, g string, x double")
        (obs, p, np_, used, ma, mb, na, nb), = rows(
            permutation_test(d, "x", "g", "id", "a", "b", n_perms=64)
        )
        assert abs(obs - 100.0) < 1e-6
        assert abs(p - 1 / 65) < 1e-6  # no replicate reaches |obs|

    def test_deterministic(self, spark):
        data = [(i, "a" if i % 3 == 0 else "b", float(i % 17)) for i in range(900)]
        d = spark.createDataFrame(data, "id long, g string, x double")
        a = rows(permutation_test(d, "x", "g", "id", "a", "b"))
        b = rows(permutation_test(d.repartition(13), "x", "g", "id", "a", "b"))
        assert a == b


class TestKmeansReport:
    def test_separated_blobs_exact(self, spark):
        import numpy as np

        rng = np.random.RandomState(6)
        pts = []
        for c, center in enumerate([0.0, 100.0]):
            for i in range(50):
                pts.append((c * 50 + i, [float(center + rng.rand()), float(center - rng.rand())]))
        d = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
        out = sorted(rows(kmeans_report(d, k=2, iters=3)))
        assert [r[1] for r in out] == [50, 50]
        # inertia tiny relative to separation
        assert all(r[2] < 50 for r in out)

    def test_deterministic_under_partitioning(self, spark):
        import numpy as np

        rng = np.random.RandomState(8)
        pts = [(i, [float(x) for x in rng.rand(8)]) for i in range(300)]
        d = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
        a = sorted(rows(kmeans_report(d, k=3, iters=2)))
        b = sorted(rows(kmeans_report(d.repartition(11), k=3, iters=2)))
        assert a == b

    def test_validation(self, spark):
        d = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="fewer than k"):
            kmeans_report(d, k=2)
