"""Round-8 batch 4: mann_kendall / ipw_ate / power_mde_report /
jackknife_ratio_ci (operators/regression.py)."""

import math

import pytest

from polars_net_spark.operators.regression import (
    _norm_ppf,
    ipw_ate,
    jackknife_ratio_ci,
    mann_kendall,
    power_mde_report,
)


def rows(lf):
    return lf.collect().rows()


def _mk_reference(ts, vs):
    """Literal O(n²) Mann-Kendall with full tie corrections."""
    n = len(ts)
    s = 0.0
    for i in range(n):
        for j in range(n):
            if ts[j] > ts[i]:
                s += (vs[j] > vs[i]) - (vs[j] < vs[i])
    from collections import Counter

    def terms(xs):
        a = b = c = 0.0
        for t in Counter(xs).values():
            a += t * (t - 1) * (2 * t + 5)
            b += t * (t - 1) * (t - 2)
            c += t * (t - 1)
        return a, b, c

    at, bt, ct = terms(ts)
    av, bv, cv = terms(vs)
    var = (n * (n - 1) * (2 * n + 5) - at - av) / 18.0
    if n > 2:
        var += bt * bv / (9.0 * n * (n - 1) * (n - 2))
    var += ct * cv / (2.0 * n * (n - 1))
    if var > 0:
        z = (s - 1) / var**0.5 if s > 0 else ((s + 1) / var**0.5 if s < 0 else 0.0)
    else:
        z = 0.0
    return s, var, z


class TestMannKendall:
    def test_monotone_increasing(self, spark):
        d = spark.createDataFrame(
            [(float(i), float(i) * 2.0) for i in range(20)], "t double, v double"
        ).repartition(5)
        (s, var_s, z, n, trend), = rows(mann_kendall(d, "t", "v"))
        assert s == 20 * 19 / 2 and n == 20 and trend == "increasing"
        rs, rvar, rz = _mk_reference(
            [float(i) for i in range(20)], [2.0 * i for i in range(20)]
        )
        assert abs(var_s - rvar) < 1e-6 and abs(z - rz) < 1e-6

    def test_ties_in_time_and_value(self, spark):
        ts = [1, 1, 2, 2, 3, 3, 4, 5, 5, 6]
        vs = [3, 3, 1, 4, 4, 2, 5, 5, 1, 6]
        d = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(ts, vs)], "t double, v double"
        ).repartition(3)
        (s, var_s, z, n, trend), = rows(mann_kendall(d, "t", "v"))
        rs, rvar, rz = _mk_reference([float(x) for x in ts], [float(x) for x in vs])
        assert s == rs and abs(var_s - rvar) < 1e-6 and abs(z - rz) < 1e-6

    def test_no_trend_flat(self, spark):
        d = spark.createDataFrame(
            [(float(i), 1.0 if i % 2 else 2.0) for i in range(12)],
            "t double, v double",
        )
        (s, var_s, z, n, trend), = rows(mann_kendall(d, "t", "v"))
        assert trend == "no trend"

    def test_too_few_raises(self, spark):
        d = spark.createDataFrame([(1.0, 1.0), (2.0, 2.0)], "t double, v double")
        with pytest.raises(ValueError):
            mann_kendall(d, "t", "v")


class TestIpwAte:
    def test_randomized_recovers_diff(self, spark):
        # p = 0.5 everywhere, treatment effect exactly +3
        data = [
            (float(5 + 3 * (i % 2)), float(i % 2), 0.5) for i in range(400)
        ]
        d = spark.createDataFrame(data, "y double, t double, p double").repartition(7)
        (n, nt, ht, hajek, se, z), = rows(ipw_ate(d, "y", "t", "p"))
        assert n == 400 and nt == 200
        assert abs(hajek - 3.0) < 1e-9
        assert abs(ht - 3.0) < 1e-9  # balanced arms, constant weights

    def test_reference_numpy(self, spark):
        import numpy as np

        rng = np.random.RandomState(5)
        n = 500
        p = 0.2 + 0.6 * rng.rand(n)
        t = (rng.rand(n) < p).astype(float)
        y = 2.0 + 1.5 * t + rng.randn(n)
        d = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(y, t, p)],
            "y double, t double, p double",
        ).repartition(9)
        (_, _, ht, hajek, se, z), = rows(ipw_ate(d, "y", "t", "p", clip=None))
        w1, w0 = t / p, (1 - t) / (1 - p)
        ref_ht = float((w1 * y).mean() - (w0 * y).mean())
        r1 = float((w1 * y).sum() / w1.sum())
        r0 = float((w0 * y).sum() / w0.sum())
        phi = (w1 * y - r1 * w1) / w1.mean() - (w0 * y - r0 * w0) / w0.mean()
        ref_se = float(np.sqrt((phi**2).sum()) / n)
        assert abs(ht - ref_ht) < 1e-6
        assert abs(hajek - (r1 - r0)) < 1e-6
        assert abs(se - ref_se) < 1e-6

    def test_aipw_doubly_robust(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        n = 300
        p = np.clip(0.3 + 0.4 * rng.rand(n), 0.01, 0.99)
        t = (rng.rand(n) < p).astype(float)
        mu1 = 4.0 + 0 * p
        mu0 = 1.0 + 0 * p
        y = np.where(t > 0, mu1, mu0) + rng.randn(n) * 0.1
        d = spark.createDataFrame(
            [tuple(map(float, r)) for r in zip(y, t, p, mu1, mu0)],
            "y double, t double, p double, m1 double, m0 double",
        )
        out = rows(ipw_ate(d, "y", "t", "p", mu1_col="m1", mu0_col="m0", clip=None))
        (_, _, ht, hajek, se, z, aipw, se_a), = out
        psi = mu1 - mu0 + t * (y - mu1) / p - (1 - t) * (y - mu0) / (1 - p)
        assert abs(aipw - float(psi.mean())) < 1e-6
        ref_se = float(np.sqrt(psi.var() / n))
        assert abs(se_a - ref_se) < 1e-6

    def test_clip_applies(self, spark):
        d = spark.createDataFrame(
            [(10.0, 1.0, 0.001), (0.0, 0.0, 0.999)], "y double, t double, p double"
        )
        (_, _, ht, *_), = rows(ipw_ate(d, "y", "t", "p", clip=0.01))
        # w1 = 1/0.01 = 100 -> ht = (10*100)/2 - 0 = 500
        assert abs(ht - 500.0) < 1e-9


class TestNormPpf:
    def test_known_quantiles(self):
        assert abs(_norm_ppf(0.975) - 1.959963984540054) < 1e-9
        assert abs(_norm_ppf(0.8) - 0.8416212335729143) < 1e-9
        assert abs(_norm_ppf(0.5)) < 1e-12
        assert abs(_norm_ppf(0.025) + 1.959963984540054) < 1e-9

    def test_domain(self):
        with pytest.raises(ValueError):
            _norm_ppf(0.0)


class TestPowerMde:
    def test_formula(self, spark):
        import numpy as np

        vals = [float(v) for v in range(100)]
        d = spark.createDataFrame([(v,) for v in vals], "v double")
        (n, mean, sd, mde_abs, mde_rel), = rows(power_mde_report(d, "v"))
        zsum = 1.959963984540054 + 0.8416212335729143
        ref_sd = float(np.std(vals, ddof=1))
        ref = zsum * ref_sd * math.sqrt(1 / 50.0 + 1 / 50.0)
        assert n == 100 and abs(sd - ref_sd) < 1e-6
        assert abs(mde_abs - ref) < 1e-6
        assert abs(mde_rel - ref / 49.5) < 1e-6

    def test_unbalanced_share_and_keys(self, spark):
        d = spark.createDataFrame(
            [("a", float(v)) for v in range(10)]
            + [("b", float(v * 3)) for v in range(40)],
            "g string, v double",
        )
        out = {r[0]: r for r in rows(power_mde_report(d, "v", by="g", treat_share=0.1))}
        import numpy as np

        zsum = 1.959963984540054 + 0.8416212335729143
        sd_b = float(np.std([v * 3 for v in range(40)], ddof=1))
        ref_b = zsum * sd_b * math.sqrt(1 / 4.0 + 1 / 36.0)
        assert abs(out["b"][4] - ref_b) < 1e-6

    def test_bad_share(self, spark):
        d = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError):
            power_mde_report(d, "v", treat_share=1.0)


class TestJackknifeRatio:
    def test_reference(self, spark):
        import numpy as np

        clusters = {f"u{i}": (float(2 + i), float(5 + (i % 3))) for i in range(12)}
        data = []
        for k, (nsum, dsum) in clusters.items():
            # split each cluster's mass across two rows
            data += [(k, nsum * 0.25, dsum * 0.5), (k, nsum * 0.75, dsum * 0.5)]
        d = spark.createDataFrame(data, "u string, num double, den double").repartition(5)
        (ratio, g, se, lo, hi, z), = rows(jackknife_ratio_ci(d, "num", "den", "u"))
        tn = sum(v[0] for v in clusters.values())
        td = sum(v[1] for v in clusters.values())
        loo = np.array(
            [(tn - a) / (td - b) for a, b in clusters.values()], dtype=float
        )
        var = (len(loo) - 1) / len(loo) * float(((loo - loo.mean()) ** 2).sum())
        assert g == 12 and abs(ratio - tn / td) < 1e-9
        assert abs(se - var**0.5) < 1e-6
        assert abs(lo - (tn / td - 1.96 * var**0.5)) < 1e-5

    def test_degenerate_cluster_raises(self, spark):
        d = spark.createDataFrame(
            [("a", 1.0, 5.0), ("b", 2.0, 0.0)], "u string, num double, den double"
        )
        with pytest.raises(ValueError, match="denominator mass"):
            jackknife_ratio_ci(d, "num", "den", "u")

    def test_single_cluster_raises(self, spark):
        d = spark.createDataFrame([("a", 1.0, 2.0)], "u string, num double, den double")
        with pytest.raises(ValueError, match="clusters"):
            jackknife_ratio_ci(d, "num", "den", "u")


class TestIpwAteFilters:
    def test_null_mu_rows_drop_entirely(self, spark):
        from polars_net_spark.operators.regression import ipw_ate

        d = spark.createDataFrame(
            [(5.0, 1.0, 0.5, 4.0, 1.0), (7.0, 0.0, 0.5, 4.0, 1.0),
             (100.0, 1.0, 0.5, None, 1.0)],
            "y double, t double, p double, m1 double, m0 double",
        )
        (n, nt, *_), = ipw_ate(
            d, "y", "t", "p", mu1_col="m1", mu0_col="m0"
        ).collect().rows()
        assert n == 2 and nt == 1  # the null-m1 row is OUT of n too

    def test_degenerate_p_drops_when_unclipped(self, spark):
        from polars_net_spark.operators.regression import ipw_ate

        d = spark.createDataFrame(
            [(5.0, 1.0, 0.0), (1.0, 1.0, 0.5), (2.0, 0.0, 0.5),
             (9.0, 0.0, 1.0)],
            "y double, t double, p double",
        )
        (n, *_), = ipw_ate(d, "y", "t", "p", clip=None).collect().rows()
        assert n == 2


class TestChangepointTies:
    def test_tied_order_values_collapse(self, spark):
        from polars_net_spark.operators.regression import best_changepoint

        # two rows per t; split must fall BETWEEN distinct t values and be
        # identical however the frame is partitioned
        data = [(float(t), v) for t in range(10) for v in (1.0, 1.2)]
        data += [(float(t), v) for t in range(10, 20) for v in (5.0, 5.2)]
        outs = set()
        for parts in (1, 3, 11):
            d = spark.createDataFrame(data, "t double, v double").repartition(parts)
            outs.add(tuple(best_changepoint(d, "t", "v").collect().rows()[0]))
        assert len(outs) == 1
        (split, nl, nr, ml, mr, drop), = [outs.pop()]
        assert split == 9.0 and nl == 20 and nr == 20
