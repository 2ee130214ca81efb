"""Round-10 batch 1: lins_ccc, bland_altman, grubbs_test, icc_oneway,
cochran_q, durbin_watson — each cross-checked against a brute-force pure-
Python reference on the same data."""

import math

from polars_net_spark.operators.regression import (
    bland_altman,
    cochran_q,
    durbin_watson,
    grubbs_test,
    icc_oneway,
    lins_ccc,
)


def rows(lf):
    return [tuple(r) for r in lf.spark.collect()]


XS = [1.0, 2.0, 3.0, 4.0, 5.0, 6.5, 7.0, 8.2]
YS = [1.2, 1.9, 3.4, 3.8, 5.1, 6.9, 6.8, 8.0]


class TestLinsCcc:
    def test_matches_brute_force(self, spark):
        d = spark.createDataFrame(list(zip(XS, YS)), "x double, y double")
        (ccc, r, cb, mx, my, n), = rows(lins_ccc(d, "x", "y"))
        nn = len(XS)
        mx_, my_ = sum(XS) / nn, sum(YS) / nn
        vx = sum((a - mx_) ** 2 for a in XS) / nn
        vy = sum((b - my_) ** 2 for b in YS) / nn
        cxy = sum((a - mx_) * (b - my_) for a, b in zip(XS, YS)) / nn
        ccc_ref = 2 * cxy / (vx + vy + (mx_ - my_) ** 2)
        assert n == nn and abs(ccc - ccc_ref) < 1e-6
        r_ref = cxy / math.sqrt(vx * vy)
        assert abs(r - r_ref) < 1e-6 and abs(cb - ccc_ref / r_ref) < 1e-6

    def test_scale_shift_penalized(self, spark):
        d = spark.createDataFrame([(x, 2 * x) for x in XS], "x double, y double")
        (ccc, r, cb, *_), = rows(lins_ccc(d, "x", "y"))
        assert r == 1.0 and ccc < 1.0

    def test_zero_variance_raises(self, spark):
        # degenerate guard (r11): constant x makes r a 0/0 — must raise at
        # execution, not emit a null row
        import pytest
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkException

        d = spark.createDataFrame([(1.0, y) for y in YS], "x double, y double")
        with pytest.raises((PySparkException, Py4JJavaError), match="zero variance"):
            rows(lins_ccc(d, "x", "y"))


class TestBlandAltman:
    def test_matches_brute_force(self, spark):
        d = spark.createDataFrame(list(zip(XS, YS)), "x double, y double")
        (bias, sd, lo, hi, mm, n), = rows(bland_altman(d, "x", "y"))
        diffs = [a - b for a, b in zip(XS, YS)]
        nn = len(diffs)
        b_ref = sum(diffs) / nn
        sd_ref = math.sqrt(sum((v - b_ref) ** 2 for v in diffs) / (nn - 1))
        assert abs(bias - b_ref) < 1e-6 and abs(sd - sd_ref) < 1e-6
        assert abs(lo - (b_ref - 1.96 * sd_ref)) < 1e-5
        assert abs(hi - (b_ref + 1.96 * sd_ref)) < 1e-5


class TestGrubbs:
    def test_max_outlier(self, spark):
        vals = [10.0, 10.2, 9.9, 10.1, 10.0, 14.5]
        d = spark.createDataFrame([(v,) for v in vals], "v double")
        (g, sv, side, mean, sd, n), = rows(grubbs_test(d, "v"))
        nn = len(vals)
        m_ = sum(vals) / nn
        s_ = math.sqrt(sum((v - m_) ** 2 for v in vals) / (nn - 1))
        assert sv == 14.5 and side == "max"
        assert abs(g - (14.5 - m_) / s_) < 1e-6

    def test_min_outlier(self, spark):
        vals = [10.0, 10.2, 9.9, 10.1, 10.0, 4.0]
        d = spark.createDataFrame([(v,) for v in vals], "v double")
        (g, sv, side, *_), = rows(grubbs_test(d, "v"))
        assert sv == 4.0 and side == "min"


class TestIccOneway:
    def test_matches_anova_reference(self, spark):
        data = {
            "a": [9.0, 10.0, 11.0],
            "b": [5.0, 6.0],
            "c": [1.0, 2.0, 3.0, 2.0],
        }
        rows_in = [(g, v) for g, vs in data.items() for v in vs]
        d = spark.createDataFrame(rows_in, "g string, v double")
        (icc, msb, msw, k0, n, ng), = rows(icc_oneway(d, "g", "v"))
        N = sum(len(v) for v in data.values())
        G = len(data)
        S = sum(sum(v) for v in data.values())
        sa = sum(sum(v) ** 2 / len(v) for v in data.values())
        ss = sum(x * x for v in data.values() for x in v)
        ssb, ssw = sa - S * S / N, ss - sa
        msb_ref, msw_ref = ssb / (G - 1), ssw / (N - G)
        k0_ref = (N - sum(len(v) ** 2 for v in data.values()) / N) / (G - 1)
        icc_ref = (msb_ref - msw_ref) / (msb_ref + (k0_ref - 1) * msw_ref)
        assert n == N and ng == G
        assert abs(msb - msb_ref) < 1e-6 and abs(msw - msw_ref) < 1e-6
        assert abs(icc - icc_ref) < 1e-6

    def test_single_group_raises(self, spark):
        import pytest
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import PySparkException

        d = spark.createDataFrame(
            [("a", v) for v in (1.0, 2.0, 3.0)], "g string, v double"
        )
        with pytest.raises((PySparkException, Py4JJavaError), match="2 groups"):
            rows(icc_oneway(d, "g", "v"))


class TestCochranQ:
    def test_matches_brute_force(self, spark):
        # 6 blocks x 3 treatments, binary
        tbl = {
            1: (1, 1, 0), 2: (1, 0, 0), 3: (0, 0, 0),
            4: (1, 1, 1), 5: (1, 0, 1), 6: (1, 1, 0),
        }
        rows_in = [
            (b, t, y)
            for b, ys in tbl.items()
            for t, y in zip(("t1", "t2", "t3"), ys)
        ]
        d = spark.createDataFrame(rows_in, "b int, t string, y int")
        (q, df, nb, k, tot), = rows(cochran_q(d, "b", "t", "y"))
        kk = 3
        C = [sum(ys[j] for ys in tbl.values()) for j in range(kk)]
        R = [sum(ys) for ys in tbl.values()]
        T = sum(R)
        q_ref = (
            kk * (kk - 1) * sum((c - T / kk) ** 2 for c in C)
            / (kk * T - sum(r * r for r in R))
        )
        assert (df, nb, k, tot) == (2, 6, 3, T)
        assert abs(q - q_ref) < 1e-6

    def test_incomplete_blocks_drop(self, spark):
        rows_in = [(1, "a", 1), (1, "b", 0), (2, "a", 1)]  # block 2 incomplete
        d = spark.createDataFrame(rows_in, "b int, t string, y int")
        (q, df, nb, k, tot), = rows(cochran_q(d, "b", "t", "y"))
        assert nb == 1 and k == 2

    def test_no_complete_blocks_raises(self, spark):
        # treatment 'c' appears only in an incomplete block, so k=3 but no
        # block has all 3 treatments — must raise, not emit a null-q row
        import pytest

        rows_in = [(1, "a", 1), (1, "b", 0), (2, "a", 1), (2, "c", 1)]
        d = spark.createDataFrame(rows_in, "b int, t string, y int")
        with pytest.raises(ValueError, match="no complete blocks"):
            cochran_q(d, "b", "t", "y")


class TestDurbinWatson:
    def test_matches_brute_force_per_key(self, spark):
        series = {"a": [1.0, 2.0, 1.5, 3.0, 2.5], "b": [1.0, -1.0, 1.0, -1.0]}
        rows_in = [(k, i, v) for k, vs in series.items() for i, v in enumerate(vs)]
        d = spark.createDataFrame(rows_in, "k string, t int, v double")
        out = dict((r[0], (r[1], r[2])) for r in rows(durbin_watson(d, "v", "t", by="k")))
        for k, vs in series.items():
            num = sum((vs[i] - vs[i - 1]) ** 2 for i in range(1, len(vs)))
            den = sum(v * v for v in vs)
            assert abs(out[k][0] - num / den) < 1e-6
            assert out[k][1] == len(vs)
        # strong negative autocorrelation -> dw near 4
        assert out["b"][0] >= 3.0

    def test_global_halo_matches_single_window(self, spark):
        vals = [float(((i * 37) % 11) - 5) for i in range(500)]
        d = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "t int, v double")
        (dw, n), = rows(durbin_watson(d, "v", "t"))
        num = sum((vals[i] - vals[i - 1]) ** 2 for i in range(1, len(vals)))
        den = sum(v * v for v in vals)
        assert n == 500 and abs(dw - num / den) < 1e-6
