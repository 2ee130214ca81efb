"""Round-11 batch 1: by_adjust, friedman_test, wilcoxon_signed_rank,
tost_equivalence — brute-force pure-Python cross-checks."""

import math

import pytest

from polars_net_spark.operators.regression import (
    bh_adjust,
    by_adjust,
    friedman_test,
    tost_equivalence,
    wilcoxon_signed_rank,
)


def rows(lf):
    return [tuple(r) for r in lf.spark.collect()]


class TestByAdjust:
    def test_matches_brute_force(self, spark):
        ps = [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212, 0.216]
        d = spark.createDataFrame([(i, p) for i, p in enumerate(ps)], "id int, p double")
        out = {r[0]: r[2] for r in rows(by_adjust(d, "p", id_cols="id"))}
        m = len(ps)
        hm = sum(1.0 / i for i in range(1, m + 1))
        order = sorted(range(m), key=lambda i: ps[i])
        raw = {i: ps[i] * m * hm / (order.index(i) + 1) for i in range(m)}
        adj_ref = {}
        running = float("inf")
        for i in reversed(order):
            running = min(running, raw[i])
            adj_ref[i] = min(1.0, running)
        for i in range(m):
            assert abs(out[i] - adj_ref[i]) < 1e-6, i

    def test_more_conservative_than_bh(self, spark):
        ps = [0.01, 0.02, 0.03, 0.2]
        d = spark.createDataFrame([(i, p) for i, p in enumerate(ps)], "id int, p double")
        bh = {r[0]: r[2] for r in rows(bh_adjust(d, "p", id_cols="id"))}
        by = {r[0]: r[2] for r in rows(by_adjust(d, "p", id_cols="id"))}
        for i in bh:
            assert by[i] >= bh[i]


class TestFriedman:
    def test_matches_brute_force(self, spark):
        # 8 blocks x 3 treatments with some ties
        tbl = {
            1: (7.0, 9.0, 8.0), 2: (6.0, 5.0, 7.0), 3: (9.0, 7.0, 6.0),
            4: (8.0, 5.0, 6.0), 5: (6.0, 8.0, 9.0), 6: (9.0, 8.0, 8.0),
            7: (10.0, 6.0, 9.0), 8: (7.0, 7.0, 8.0),
        }
        rows_in = [
            (b, t, v)
            for b, vs in tbl.items()
            for t, v in zip(("t1", "t2", "t3"), vs)
        ]
        d = spark.createDataFrame(rows_in, "b int, t string, v double")
        (chi2, df, nb, k), = rows(friedman_test(d, "b", "t", "v"))

        def avg_ranks(vs):
            s = sorted(vs)
            return [
                (s.index(v) + 1 + len(s) - s[::-1].index(v) - 1 + 1) / 2.0
                for v in vs
            ]

        kk, n = 3, len(tbl)
        R = [0.0] * kk
        sr2 = 0.0
        for vs in tbl.values():
            rs = avg_ranks(list(vs))
            for j, r in enumerate(rs):
                R[j] += r
                sr2 += r * r
        num = sum((r - n * (kk + 1) / 2.0) ** 2 for r in R)
        den = sr2 - n * kk * (kk + 1) ** 2 / 4.0
        chi2_ref = (kk - 1) * num / den
        assert (df, nb, k) == (2, 8, 3)
        assert abs(chi2 - chi2_ref) < 1e-6

    def test_incomplete_blocks_drop_and_raise(self, spark):
        rows_in = [(1, "a", 1.0), (1, "b", 2.0), (2, "a", 3.0)]
        d = spark.createDataFrame(rows_in, "b int, t string, v double")
        (chi2, df, nb, k), = rows(friedman_test(d, "b", "t", "v"))
        assert nb == 1 and k == 2
        rows_in2 = [(1, "a", 1.0), (1, "b", 2.0), (2, "a", 3.0), (2, "c", 1.0)]
        d2 = spark.createDataFrame(rows_in2, "b int, t string, v double")
        with pytest.raises(ValueError, match="no complete blocks"):
            friedman_test(d2, "b", "t", "v")


class TestWilcoxonSignedRank:
    def test_matches_brute_force(self, spark):
        xs = [12.0, 11.0, 15.0, 14.0, 10.0, 13.0, 9.0, 16.0, 12.5, 11.5]
        ys = [10.0, 12.0, 13.0, 14.0, 9.0, 10.0, 11.0, 13.0, 12.5, 10.0]
        d = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
        (wp, wm, z, n), = rows(wilcoxon_signed_rank(d, "x", "y"))
        diffs = [(a - b) for a, b in zip(xs, ys) if a != b]
        absd = sorted(abs(v) for v in diffs)

        def avg_rank(a):
            lo = absd.index(a) + 1
            hi = len(absd) - absd[::-1].index(a)
            return (lo + hi) / 2.0

        wp_ref = sum(avg_rank(abs(v)) for v in diffs if v > 0)
        wm_ref = sum(avg_rank(abs(v)) for v in diffs if v < 0)
        nn = len(diffs)
        from collections import Counter

        ties = Counter(abs(v) for v in diffs)
        tie_term = sum(t ** 3 - t for t in ties.values())
        mu = nn * (nn + 1) / 4.0
        var = nn * (nn + 1) * (2 * nn + 1) / 24.0 - tie_term / 48.0
        z_ref = (wp_ref - mu) / math.sqrt(var)
        assert n == nn
        assert abs(wp - wp_ref) < 1e-6 and abs(wm - wm_ref) < 1e-6
        assert abs(z - z_ref) < 1e-6

    def test_rank_identity(self, spark):
        # W+ + W- must equal n(n+1)/2 whatever the ties
        xs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
        ys = [2.0, 1.0, 5.0, 2.0, 5.0, 8.0]
        d = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
        (wp, wm, z, n), = rows(wilcoxon_signed_rank(d, "x", "y"))
        assert abs((wp + wm) - n * (n + 1) / 2.0) < 1e-9


class TestTost:
    def test_matches_brute_force(self, spark):
        a = [10.1, 10.3, 9.8, 10.0, 10.2, 9.9, 10.4]
        b = [10.0, 10.2, 10.1, 9.9, 10.3, 10.0]
        rows_in = [("a", v) for v in a] + [("b", v) for v in b]
        d = spark.createDataFrame(rows_in, "g string, v double")
        (diff, se, tl, tu, df, na, nb), = rows(
            tost_equivalence(d, "g", "v", "a", "b", low=-0.5, high=0.5)
        )
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        va = sum((v - ma) ** 2 for v in a) / (len(a) - 1)
        vb = sum((v - mb) ** 2 for v in b) / (len(b) - 1)
        sa, sb = va / len(a), vb / len(b)
        se_ref = math.sqrt(sa + sb)
        df_ref = (sa + sb) ** 2 / (
            sa * sa / (len(a) - 1) + sb * sb / (len(b) - 1)
        )
        assert (na, nb) == (7, 6)
        assert abs(diff - (ma - mb)) < 1e-6 and abs(se - se_ref) < 1e-6
        assert abs(tl - (ma - mb + 0.5) / se_ref) < 1e-5
        assert abs(tu - (ma - mb - 0.5) / se_ref) < 1e-5
        assert abs(df - df_ref) < 1e-4
        # clearly-equivalent data: t_lower large positive, t_upper large negative
        assert tl > 2 and tu < -2

    def test_bad_margin_raises(self, spark):
        d = spark.createDataFrame([("a", 1.0)], "g string, v double")
        with pytest.raises(ValueError, match="low < high"):
            tost_equivalence(d, "g", "v", "a", "b", low=0.5, high=-0.5)
