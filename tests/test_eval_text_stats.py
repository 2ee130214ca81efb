"""Tests for rouge_n_frame, edit_distance_report, srm_check, and
with_mahalanobis (q243-q246 operators)."""

import math

import pytest

from polars_net_spark.llm.evaluation import edit_distance_report, rouge_n_frame
from polars_net_spark.operators.regression import srm_check, with_mahalanobis


def rows(lf):
    return lf.collect().rows()


class TestRouge:
    def test_rouge1_clipped_counts(self, spark):
        # cand: "the the cat", ref: "the cat sat" -> overlap the(min 2,1)=1
        # + cat(1,1)=1 = 2; p=2/3, r=2/3
        df = spark.createDataFrame(
            [(1, "the the cat", "the cat sat")], "id long, c string, r string"
        )
        out = rows(rouge_n_frame(df, "c", "r"))[0]
        _, _, _, nc, nr, ov, p, r, f1 = out
        assert (nc, nr, ov) == (3, 3, 2)
        assert p == pytest.approx(2 / 3, abs=1e-6)
        assert r == pytest.approx(2 / 3, abs=1e-6)
        assert f1 == pytest.approx(2 / 3, abs=1e-6)

    def test_rouge2_bigrams(self, spark):
        # shared bigrams of "a b c d" vs "a b c e": "a b", "b c" -> 2 of 3
        df = spark.createDataFrame(
            [(1, "a b c d", "a b c e")], "id long, c string, r string"
        )
        out = rows(rouge_n_frame(df, "c", "r", n=2))[0]
        assert out[5] == 2 and out[3] == 3 and out[4] == 3

    def test_identical_and_disjoint(self, spark):
        df = spark.createDataFrame(
            [(1, "x y z", "x y z"), (2, "a b", "c d")],
            "id long, c string, r string",
        )
        out = {r[0]: r for r in rows(rouge_n_frame(df, "c", "r"))}
        assert out[1][8] == 1.0  # f1 identical
        assert out[2][6] == 0.0 and out[2][8] == 0.0  # disjoint -> 0, not null

    def test_empty_and_null_sides(self, spark):
        df = spark.createDataFrame(
            [(1, "", "a b"), (2, "a", None)], "id long, c string, r string"
        )
        out = {r[0]: r for r in rows(rouge_n_frame(df, "c", "r"))}
        assert out[1][3] == 0 and out[1][6] is None  # empty cand -> null p
        assert out[2][4] == 0 and out[2][7] is None  # null ref -> null r
        assert out[1][8] is None and out[2][8] is None

    def test_lowercase_default(self, spark):
        df = spark.createDataFrame([(1, "Cat", "cat")], "id long, c string, r string")
        assert rows(rouge_n_frame(df, "c", "r"))[0][5] == 1

    def test_short_text_has_no_ngrams(self, spark):
        df = spark.createDataFrame([(1, "a", "a b c")], "id long, c string, r string")
        out = rows(rouge_n_frame(df, "c", "r", n=2))[0]
        assert out[3] == 0 and out[6] is None  # 1 word -> 0 bigrams


class TestEditDistance:
    def test_basic(self, spark):
        df = spark.createDataFrame(
            [(1, "kitten", "sitting"), (2, "same", "same")],
            "id long, c string, r string",
        )
        out = {r[0]: r for r in rows(edit_distance_report(df, "c", "r"))}
        assert out[1][3] == 3
        assert out[1][4] == pytest.approx(3 / 7, abs=1e-6)  # cer
        assert out[1][5] == pytest.approx(1 - 3 / 7, abs=1e-6)
        assert out[1][6] is False
        assert out[2][3] == 0 and out[2][6] is True and out[2][5] == 1.0

    def test_empty_ref_null_cer(self, spark):
        df = spark.createDataFrame(
            [(1, "abc", ""), (2, None, None)], "id long, c string, r string"
        )
        out = {r[0]: r for r in rows(edit_distance_report(df, "c", "r"))}
        assert out[1][3] == 3 and out[1][4] is None
        assert out[2][3] == 0 and out[2][5] == 1.0 and out[2][6] is True


class TestSrm:
    def test_balanced_design(self, spark):
        df = spark.createDataFrame(
            [("a",)] * 50 + [("b",)] * 50 + [("z",)] * 7, "g string"
        )
        n, chi2, df_, mad = rows(srm_check(df, "g", {"a": 0.5, "b": 0.5}))[0]
        assert n == 100 and chi2 == 0.0 and df_ == 1 and mad == 0.0

    def test_mismatch_and_zero_group(self, spark):
        df = spark.createDataFrame([("a",)] * 90 + [("b",)] * 10, "g string")
        n, chi2, df_, mad = rows(
            srm_check(df, "g", {"a": 0.5, "b": 0.25, "c": 0.25})
        )[0]
        assert n == 100 and df_ == 2
        # E = (50, 25, 25): chi2 = 1600/50 + 225/25 + 625/25 = 66
        assert chi2 == pytest.approx(66.0, abs=1e-6)
        assert mad == pytest.approx(0.4, abs=1e-6)

    def test_weights_normalize(self, spark):
        df = spark.createDataFrame([("a",)] * 30 + [("b",)] * 10, "g string")
        n, chi2, df_, mad = rows(srm_check(df, "g", {"a": 3, "b": 1}))[0]
        assert chi2 == 0.0 and mad == 0.0

    def test_empty_expected_raises(self, spark):
        df = spark.createDataFrame([("a",)], "g string")
        with pytest.raises(ValueError):
            srm_check(df, "g", {})

    def test_integer_arms_with_string_keys(self, spark):
        # regression: an uncast isin with int arms vs string dict keys
        # silently excluded every row (n=0, null chi2)
        df = spark.createDataFrame([(1,)] * 50 + [(2,)] * 50 + [(9,)] * 3, "g int")
        n, chi2, df_, mad = rows(srm_check(df, "g", {"1": 0.5, "2": 0.5}))[0]
        assert n == 100 and chi2 == 0.0 and df_ == 1 and mad == 0.0
        # int dict keys work identically
        n2, chi22, _, _ = rows(srm_check(df, "g", {1: 0.5, 2: 0.5}))[0]
        assert n2 == 100 and chi22 == 0.0


class TestMahalanobis:
    def test_1d_equals_squared_zscore(self, spark):
        vals = [1.0, 2.0, 3.0, 4.0, 10.0]
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        out = rows(with_mahalanobis(df, ["x"]))
        mu = sum(vals) / len(vals)
        var = sum((v - mu) ** 2 for v in vals) / (len(vals) - 1)
        for (x, md2) in out:
            assert md2 == pytest.approx((x - mu) ** 2 / var, abs=1e-6)

    def test_2d_matches_numpy(self, spark):
        import numpy as np

        data = [(1.0, 2.0), (2.0, 3.5), (3.0, 5.5), (4.0, 8.5), (5.0, 9.0)]
        df = spark.createDataFrame(data, "x double, y double")
        out = rows(with_mahalanobis(df, ["x", "y"]))
        arr = np.array(data)
        mu = arr.mean(axis=0)
        cov = np.cov(arr.T, ddof=1)
        inv = np.linalg.inv(cov)
        for (x, y, md2) in out:
            v = np.array([x, y]) - mu
            assert md2 == pytest.approx(float(v @ inv @ v), abs=1e-6)

    def test_null_rows_get_null_score(self, spark):
        df = spark.createDataFrame(
            [(1.0, 1.0), (2.0, 3.0), (3.0, 2.0), (None, 4.0)],
            "x double, y double",
        )
        out = rows(with_mahalanobis(df, ["x", "y"]))
        assert [r[2] for r in out if r[0] is None] == [None]
        assert all(r[2] is not None for r in out if r[0] is not None)

    def test_singular_raises(self, spark):
        df = spark.createDataFrame(
            [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)], "x double, y double"
        )
        with pytest.raises(ValueError, match="singular"):
            with_mahalanobis(df, ["x", "y"])
