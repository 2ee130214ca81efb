"""Round-10 batch 3: quantile_normalize, page_hinkley."""

import pytest

from polars_net_spark.operators.analytics import page_hinkley, quantile_normalize


def rows(lf):
    return [tuple(r) for r in lf.spark.collect()]


class TestQuantileNormalize:
    def test_matches_brute_force(self, spark):
        data = {
            "a": [5.0, 2.0, 3.0, 4.0],
            "b": [4.0, 1.0, 4.0, 2.0],
            "c": [3.0, 4.0, 6.0, 8.0],
        }
        rows_in = [
            (g, f"{g}{i}", v) for g, vs in data.items() for i, v in enumerate(vs)
        ]
        d = spark.createDataFrame(rows_in, "g string, id string, v double")
        got = {(r[0], r[1]): r[3] for r in rows(quantile_normalize(d, "g", "v", "id"))}
        # reference: mean of k-th smallest across groups
        ref = [
            sum(sorted(vs)[k] for vs in data.values()) / len(data)
            for k in range(4)
        ]
        for g, vs in data.items():
            order = sorted(
                range(len(vs)), key=lambda i: (vs[i], f"{g}{i}")
            )
            for rank, i in enumerate(order):
                assert abs(got[(g, f"{g}{i}")] - ref[rank]) < 1e-6

    def test_distributions_identical_after(self, spark):
        rows_in = [("a", str(i), float(i * i % 17)) for i in range(20)] + [
            ("b", "b" + str(i), float((i * 7) % 23)) for i in range(20)
        ]
        d = spark.createDataFrame(rows_in, "g string, id string, v double")
        out = rows(quantile_normalize(d, "g", "v", "id"))
        a = sorted(r[3] for r in out if r[0] == "a")
        b = sorted(r[3] for r in out if r[0] == "b")
        assert a == b

    def test_unequal_sizes_raise(self, spark):
        d = spark.createDataFrame(
            [("a", "1", 1.0), ("a", "2", 2.0), ("b", "3", 3.0)],
            "g string, id string, v double",
        )
        with pytest.raises(ValueError, match="equal group sizes"):
            quantile_normalize(d, "g", "v", "id")


class TestPageHinkley:
    def test_detects_level_shift(self, spark):
        vals = [0.0] * 40 + [5.0] * 20  # clear upward shift at t=40
        d = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate(vals)], "k string, t int, v double"
        )
        out = rows(page_hinkley(d, "v", "t", by="k", delta=0.1, lam=10.0))
        alarms = [r for r in out if r[4]]
        assert alarms and min(r[1] for r in alarms) > 40
        # stable series: no alarm, only the final summary row
        d2 = spark.createDataFrame(
            [("k", i, float((i * 13) % 7) / 7.0) for i in range(60)],
            "k string, t int, v double",
        )
        out2 = rows(page_hinkley(d2, "v", "t", by="k", delta=0.5, lam=10.0))
        assert len(out2) == 1 and not out2[0][4]

    def test_matches_brute_force(self, spark):
        vals = [1.0, 2.0, 0.5, 3.0, 10.0, 11.0, 12.0]
        d = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate(vals)], "k string, t int, v double"
        )
        out = {r[1]: r[3] for r in rows(page_hinkley(d, "v", "t", by="k", delta=0.0, lam=0.5))}
        m, mn = 0.0, 0.0
        s = 0.0
        ref = {}
        for i, x in enumerate(vals):
            s += x
            mean = s / (i + 1)
            m += x - mean
            mn = min(mn, m)
            ref[i] = m - mn
        for t, ph in out.items():
            assert abs(ph - ref[t]) < 1e-6


class TestHurst:
    def test_matches_brute_force(self, spark):
        from polars_net_spark.operators.analytics import hurst_exponent

        import math

        vals = [math.sin(i / 5.0) + ((i * 29) % 13) / 13.0 for i in range(300)]
        d = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "t int, v double"
        )
        (h, r2, n, nw), = [
            tuple(r) for r in hurst_exponent(d, "v", "t", window_sizes=(8, 16, 32)).spark.collect()
        ]

        def rs_mean(w):
            out = []
            for s in range(0, len(vals) - w + 1, w):
                win = vals[s:s + w]
                mu = sum(win) / w
                cd, mx, mn, acc = [], None, None, 0.0
                for x in win:
                    acc += x - mu
                    cd.append(acc)
                r = max(cd) - min(cd)
                sd = math.sqrt(sum((x - mu) ** 2 for x in win) / w)
                if sd > 0:
                    out.append(r / sd)
            return sum(out) / len(out), len(out)

        pts = []
        tot = 0
        for w in (8, 16, 32):
            m, c = rs_mean(w)
            pts.append((math.log(w), math.log(m)))
            tot += c
        k = len(pts)
        sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
        sxx = sum(p[0] ** 2 for p in pts); sxy = sum(p[0] * p[1] for p in pts)
        h_ref = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        assert n == 300 and nw == tot
        assert abs(h - h_ref) < 1e-6

    def test_random_walk_near_half(self, spark):
        from polars_net_spark.operators.analytics import hurst_exponent

        import random

        rnd = random.Random(5)
        incs = [rnd.gauss(0, 1) for _ in range(2048)]
        d = spark.createDataFrame(
            [(i, v) for i, v in enumerate(incs)], "t int, v double"
        )
        (h, r2, n, nw), = [
            tuple(r)
            for r in hurst_exponent(d, "v", "t", window_sizes=(16, 32, 64, 128)).spark.collect()
        ]
        # iid increments: H ~ 0.5 (R/S small-sample bias pushes slightly up)
        assert 0.35 < h < 0.72 and r2 > 0.9
