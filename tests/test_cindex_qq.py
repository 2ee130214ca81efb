"""Round-8 batch: c_index + quantile_compare (operators/analytics.py)."""

import pytest

from polars_net_spark.operators.analytics import c_index, quantile_compare


def rows(lf):
    return lf.collect().rows()


def _ref_cindex(data):
    """Literal O(n^2) Harrell c: permissible = t_i < t_j and d_i = 1."""
    np_ = conc = tied = 0
    for ti, di, si in data:
        if di != 1:
            continue
        for tj, dj, sj in data:
            if tj > ti:
                np_ += 1
                if si > sj:
                    conc += 1
                elif si == sj:
                    tied += 1
    return np_, conc, tied


class TestCIndex:
    def test_perfect_ranking(self, spark):
        # risk score = -t: earlier failures always scored higher
        data = [(float(t), 1, float(-t)) for t in range(1, 11)]
        d = spark.createDataFrame(data, "t double, d int, s double")
        (c, np_, conc, tied, n), = rows(c_index(d, "t", "d", "s"))
        assert c == 1.0 and np_ == 45 and conc == 45 and n == 10

    def test_reference_with_censoring_and_ties(self, spark):
        import numpy as np

        rng = np.random.RandomState(11)
        data = [
            (float(rng.randint(1, 15)), int(rng.rand() < 0.7),
             float(rng.randint(0, 5)))
            for _ in range(80)
        ]
        d = spark.createDataFrame(data, "t double, d int, s double").repartition(7)
        (c, np_, conc, tied, n), = rows(c_index(d, "t", "d", "s"))
        rp, rc, rt = _ref_cindex(data)
        assert (np_, conc, tied) == (rp, rc, rt)
        assert abs(c - (rc + 0.5 * rt) / rp) < 1e-6

    def test_censored_only_null(self, spark):
        d = spark.createDataFrame(
            [(1.0, 0, 5.0), (2.0, 0, 3.0)], "t double, d int, s double"
        )
        (c, np_, *_), = rows(c_index(d, "t", "d", "s"))
        assert c is None and np_ == 0


class TestQuantileCompare:
    def test_known_quantiles(self, spark):
        # group a = 1..100, group b = 1..100 + 50
        d = spark.createDataFrame(
            [("a", float(i)) for i in range(1, 101)]
            + [("b", float(i) + 50.0) for i in range(1, 101)],
            "g string, v double",
        ).repartition(6)
        out = {r[0]: r for r in rows(
            quantile_compare(d, "v", "g", "a", "b", probs=(0.1, 0.5, 0.9))
        )}
        # type-1 quantile: smallest v with cum >= ceil(p*100)
        assert out[0.1][1] == 10.0 and out[0.1][2] == 60.0 and out[0.1][3] == 50.0
        assert out[0.5][1] == 50.0 and out[0.5][2] == 100.0
        assert out[0.9][1] == 90.0 and out[0.9][2] == 140.0

    def test_matches_numpy_inverse_cdf(self, spark):
        import math

        import numpy as np

        rng = np.random.RandomState(4)
        a = rng.exponential(2.0, 300).round(3)
        b = rng.exponential(3.0, 200).round(3)
        d = spark.createDataFrame(
            [("a", float(v)) for v in a] + [("b", float(v)) for v in b],
            "g string, v double",
        ).repartition(9)
        out = {r[0]: r for r in rows(quantile_compare(d, "v", "g", "a", "b"))}
        sa, sb = np.sort(a), np.sort(b)
        for p in (0.1, 0.25, 0.5, 0.75, 0.9):
            qa = float(sa[math.ceil(p * len(sa)) - 1])
            qb = float(sb[math.ceil(p * len(sb)) - 1])
            assert abs(out[p][1] - qa) < 1e-6, p
            assert abs(out[p][2] - qb) < 1e-6, p

    def test_p1_is_max(self, spark):
        d = spark.createDataFrame(
            [("a", 1.0), ("a", 9.0), ("b", 4.0)], "g string, v double"
        )
        out = rows(quantile_compare(d, "v", "g", "a", "b", probs=(1.0,)))
        assert out[0][1] == 9.0 and out[0][2] == 4.0

    def test_bad_probs(self, spark):
        d = spark.createDataFrame([("a", 1.0)], "g string, v double")
        with pytest.raises(ValueError):
            quantile_compare(d, "v", "g", "a", "b", probs=(0.0,))

    def test_missing_group_raises(self, spark):
        d = spark.createDataFrame([("a", 1.0)], "g string, v double")
        with pytest.raises(ValueError, match="at least one value"):
            quantile_compare(d, "v", "g", "a", "zz")
