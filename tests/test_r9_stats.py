"""Round-9 statistics operators: jarque_bera, levene_test, energy_distance,
pettitt_test, best_split, cox_ph."""
import math

import pytest

from polars_net_spark.operators.regression import (
    best_split,
    cox_ph,
    energy_distance,
    jarque_bera,
    levene_test,
    pettitt_test,
)


def rows(lf):
    return [tuple(r) for r in lf.spark.collect()]


class TestJarqueBera:
    def test_symmetric_lowish_jb(self, spark):
        # deterministic near-normal sample via inverse-ish construction
        import numpy as np

        rng = np.random.RandomState(3)
        d = spark.createDataFrame([(float(v),) for v in rng.randn(4000)], "x double")
        (n, skew, kurt, jb, p), = rows(jarque_bera(d, "x"))
        assert n == 4000 and abs(skew) < 0.15 and abs(kurt) < 0.3
        assert p > 0.01

    def test_heavy_skew_rejects(self, spark):
        import numpy as np

        rng = np.random.RandomState(5)
        d = spark.createDataFrame(
            [(float(math.exp(v)),) for v in rng.randn(2000)], "x double"
        )
        (n, skew, kurt, jb, p), = rows(jarque_bera(d, "x"))
        assert skew > 1.0 and p < 1e-6

    def test_matches_manual_formula(self, spark):
        vals = [1.0, 2.0, 2.5, 3.0, 10.0, 2.2, 1.8]
        d = spark.createDataFrame([(v,) for v in vals], "x double")
        import numpy as np

        a = np.array(vals)
        m2 = ((a - a.mean()) ** 2).mean()
        g1 = ((a - a.mean()) ** 3).mean() / m2 ** 1.5
        g2 = ((a - a.mean()) ** 4).mean() / m2 ** 2 - 3
        jb = len(a) / 6 * (g1 ** 2 + g2 ** 2 / 4)
        (n, skew, kurt, stat, p), = rows(jarque_bera(d, "x"))
        assert abs(skew - g1) < 1e-6 and abs(kurt - g2) < 1e-6
        assert abs(stat - jb) < 1e-6 and abs(p - math.exp(-jb / 2)) < 1e-6

    def test_validation(self, spark):
        d = spark.createDataFrame([(1.0,)] * 10, "x double")
        with pytest.raises(ValueError, match="zero variance"):
            jarque_bera(d, "x")


class TestLevene:
    def test_equal_spread_small_f(self, spark):
        data = [("a", float(v % 10)) for v in range(200)] + [
            ("b", float(v % 10) + 50) for v in range(200)
        ]
        d = spark.createDataFrame(data, "g string, x double")
        (f, df1, df2, n, k), = rows(levene_test(d, "x", "g"))
        assert df1 == 1 and df2 == 398 and n == 400 and k == 2
        assert f < 0.01  # identical spreads, location shift irrelevant

    def test_unequal_spread_large_f(self, spark):
        import numpy as np

        rng = np.random.RandomState(11)
        data = [("a", float(v)) for v in rng.randn(300)] + [
            ("b", float(v * 6)) for v in rng.randn(300)
        ]
        d = spark.createDataFrame(data, "g string, x double")
        (f, df1, df2, n, k), = rows(levene_test(d, "x", "g"))
        assert f > 50

    def test_matches_manual_brown_forsythe(self, spark):
        import numpy as np

        ga = [1.0, 2.0, 3.0, 4.0, 9.0]
        gb = [2.0, 2.1, 2.2, 2.3]
        d = spark.createDataFrame(
            [("a", v) for v in ga] + [("b", v) for v in gb], "g string, x double"
        )
        za = np.abs(np.array(ga) - np.median(ga))
        zb = np.abs(np.array(gb) - np.median(gb))
        z = np.concatenate([za, zb])
        k, n = 2, len(z)
        ssb = len(za) * (za.mean() - z.mean()) ** 2 + len(zb) * (zb.mean() - z.mean()) ** 2
        ssw = ((za - za.mean()) ** 2).sum() + ((zb - zb.mean()) ** 2).sum()
        f_ref = (ssb / (k - 1)) / (ssw / (n - k))
        (f, df1, df2, nn, kk), = rows(levene_test(d, "x", "g"))
        assert abs(f - f_ref) < 1e-6

    def test_validation(self, spark):
        d = spark.createDataFrame([("a", 1.0)], "g string, x double")
        with pytest.raises(ValueError, match="2 groups"):
            levene_test(d, "x", "g")


class TestEnergyDistance:
    def test_identical_distributions_zero(self, spark):
        data = [("a", float(v % 50)) for v in range(500)] + [
            ("b", float(v % 50)) for v in range(500)
        ]
        d = spark.createDataFrame(data, "g string, x double").repartition(7)
        (ed, ec, ewa, ewb, na, nb), = rows(energy_distance(d, "x", "g", "a", "b"))
        assert na == nb == 500 and ed < 1e-6

    def test_matches_brute_force(self, spark):
        import numpy as np

        rng = np.random.RandomState(2)
        a = rng.randn(80).round(3)
        b = (rng.randn(60) * 2 + 1).round(3)
        d = spark.createDataFrame(
            [("a", float(v)) for v in a] + [("b", float(v)) for v in b],
            "g string, x double",
        ).repartition(5)
        exy = np.abs(a[:, None] - b[None, :]).mean()
        exx = np.abs(a[:, None] - a[None, :]).mean()
        eyy = np.abs(b[:, None] - b[None, :]).mean()
        d2 = 2 * exy - exx - eyy
        (ed, ec, ewa, ewb, na, nb), = rows(energy_distance(d, "x", "g", "a", "b"))
        assert abs(ec - exy) < 1e-6 and abs(ewa - exx) < 1e-6
        assert abs(ed - math.sqrt(d2)) < 1e-6

    def test_validation(self, spark):
        d = spark.createDataFrame([("a", 1.0)], "g string, x double")
        with pytest.raises(ValueError, match="at least 1 row"):
            energy_distance(d, "x", "g", "a", "b")


class TestPettitt:
    def test_clean_level_shift_found(self, spark):
        vals = [(float(i), 10.0 + (0.3 * (i % 7))) for i in range(60)] + [
            (float(i), 25.0 + (0.3 * (i % 7))) for i in range(60, 120)
        ]
        d = spark.createDataFrame(vals, "t double, v double").repartition(6)
        (split, u, k, n, p), = rows(pettitt_test(d, "t", "v"))
        assert split == 59.0 and n == 120 and p < 1e-6

    def test_matches_brute_force(self, spark):
        import numpy as np

        rng = np.random.RandomState(9)
        v = np.concatenate([rng.randn(30), rng.randn(25) + 1.2]).round(3)
        n = len(v)
        # average ranks
        order = np.argsort(v, kind="mergesort")
        ranks = np.empty(n)
        sv = v[order]
        i = 0
        while i < n:
            j = i
            while j < n and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        U = 2 * np.cumsum(ranks) - (np.arange(1, n + 1)) * (n + 1)
        K = np.abs(U[: n - 1]).max()
        tstar = int(np.argmax(np.abs(U[: n - 1])))
        p_ref = min(1.0, 2 * math.exp(-6 * K * K / (n ** 3 + n ** 2)))
        d = spark.createDataFrame(
            [(float(i), float(v[i])) for i in range(n)], "t double, v double"
        ).repartition(4)
        (split, u, k, nn, p), = rows(pettitt_test(d, "t", "v"))
        assert nn == n and abs(k - K) < 1e-6 and split == float(tstar)
        assert abs(p - p_ref) < 1e-6

    def test_tied_times_collapse(self, spark):
        d = spark.createDataFrame(
            [(1.0, 5.0), (1.0, 7.0), (2.0, 6.0), (3.0, 20.0), (4.0, 21.0)],
            "t double, v double",
        )
        (split, u, k, n, p), = rows(pettitt_test(d, "t", "v"))
        assert n == 4 and split == 2.0  # (1.0 -> mean 6.0)


class TestBestSplit:
    def test_perfect_split(self, spark):
        data = [(float(i), 0) for i in range(50)] + [(float(i), 1) for i in range(50, 100)]
        d = spark.createDataFrame(data, "x double, y int").repartition(8)
        (thr, drop, gp, nl, nr, pl, pr), = rows(best_split(d, "x", "y"))
        assert thr == 49.0 and nl == nr == 50
        assert pl == 0.0 and pr == 1.0 and abs(gp - 0.5) < 1e-9 and abs(drop - 0.5) < 1e-9

    def test_matches_brute_force(self, spark):
        import numpy as np

        rng = np.random.RandomState(13)
        x = rng.randint(0, 25, 400).astype(float)
        y = (x + rng.randn(400) * 6 > 14).astype(int)
        if y.min() == y.max():
            y[0] = 1 - y[0]
        d = spark.createDataFrame(
            [(float(x[i]), int(y[i])) for i in range(400)], "x double, y int"
        )
        best = (-1.0, None)
        nn, npos = len(x), y.sum()
        gp = 1 - (npos / nn) ** 2 - (1 - npos / nn) ** 2
        for s in sorted(set(x))[:-1]:
            m = x <= s
            nl, pl = m.sum(), y[m].sum()
            nr, pr = nn - nl, npos - pl
            gl = 1 - (pl / nl) ** 2 - (1 - pl / nl) ** 2
            gr = 1 - (pr / nr) ** 2 - (1 - pr / nr) ** 2
            dr = gp - nl / nn * gl - nr / nn * gr
            if dr > best[0] + 1e-12:
                best = (dr, s)
        (thr, drop, gpo, nl, nr, pl, pr), = rows(best_split(d, "x", "y"))
        assert thr == best[1] and abs(drop - best[0]) < 1e-6

    def test_validation(self, spark):
        d = spark.createDataFrame([(1.0, 1), (2.0, 1)], "x double, y int")
        with pytest.raises(ValueError, match="constant"):
            best_split(d, "x", "y")


class TestCoxPH:
    def test_matches_numpy_newton(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        n = 150
        x = rng.randn(n).round(2)
        t = np.round(-np.log(rng.rand(n)) / (0.1 * np.exp(0.5 * x)), 3)
        e = (rng.rand(n) > 0.3).astype(int)

        def score_info(beta):
            U = I = 0.0
            for ti in np.unique(t[e == 1]):
                ar = t >= ti
                w = np.exp(x[ar] * beta)
                s0, s1, s2 = w.sum(), (x[ar] * w).sum(), (x[ar] ** 2 * w).sum()
                ev = (t == ti) & (e == 1)
                d_ = ev.sum()
                U += x[ev].sum() - d_ * s1 / s0
                I += d_ * (s2 / s0 - (s1 / s0) ** 2)
            return U, I

        b = 0.0
        for _ in range(4):
            U, I = score_info(b)
            b += U / I
        _, I = score_info(b)
        d = spark.createDataFrame(
            [(float(t[i]), int(e[i]), float(x[i])) for i in range(n)],
            "t double, e int, x double",
        ).repartition(6)
        (beta, hr, se, z, nn, nev, rr), = rows(cox_ph(d, "t", "e", "x"))
        assert abs(beta - b) < 1e-6 and abs(se - 1 / math.sqrt(I)) < 1e-6
        assert nn == n and nev == int(e.sum()) and rr == 4

    def test_protective_covariate_negative_beta(self, spark):
        import numpy as np

        rng = np.random.RandomState(21)
        n = 800
        x = rng.choice([0.0, 1.0], n)
        t = -np.log(rng.rand(n)) / (0.2 * np.exp(-0.8 * x))
        d = spark.createDataFrame(
            [(float(t[i]), 1, float(x[i])) for i in range(n)],
            "t double, e int, x double",
        )
        (beta, hr, se, z, nn, nev, rr), = rows(cox_ph(d, "t", "e", "x"))
        assert beta < -0.5 and hr < 0.6 and z < -5

    def test_validation(self, spark):
        d = spark.createDataFrame([(1.0, 0, 1.0), (2.0, 0, 2.0)], "t double, e int, x double")
        with pytest.raises(ValueError, match="no events"):
            cox_ph(d, "t", "e", "x")
        d2 = spark.createDataFrame([(1.0, 1, 1.0), (2.0, 1, 1.0)], "t double, e int, x double")
        with pytest.raises(ValueError, match="variation"):
            cox_ph(d2, "t", "e", "x")
