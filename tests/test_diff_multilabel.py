"""Tests for frame_diff and multilabel_report (q258-q259 operators)."""

import pytest

from polars_net_spark.llm.evaluation import multilabel_report
from polars_net_spark.operators.validate import frame_diff


def rows(lf):
    return lf.collect().rows()


class TestFrameDiff:
    def test_all_statuses(self, spark):
        left = spark.createDataFrame(
            [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")],
            "k long, v double, s string",
        )
        right = spark.createDataFrame(
            [(1, 10.0, "a"), (2, 99.0, "b"), (4, 40.0, "d")],
            "k long, v double, s string",
        )
        out = dict(rows(frame_diff(left, right, "k")))
        assert out["unchanged"] == 1  # key 1
        assert out["changed"] == 1    # key 2 (v differs)
        assert out["removed"] == 1    # key 3
        assert out["added"] == 1      # key 4
        assert out["col:v"] == 1 and out["col:s"] == 0

    def test_null_safe_compare(self, spark):
        left = spark.createDataFrame([(1, None), (2, 5.0)], "k long, v double")
        right = spark.createDataFrame([(1, None), (2, None)], "k long, v double")
        out = dict(rows(frame_diff(left, right, "k")))
        assert out["unchanged"] == 1  # null == null under eqNullSafe
        assert out["changed"] == 1 and out["col:v"] == 1

    def test_compare_subset(self, spark):
        left = spark.createDataFrame([(1, 1.0, "x")], "k long, v double, s string")
        right = spark.createDataFrame([(1, 2.0, "x")], "k long, v double, s string")
        out = dict(rows(frame_diff(left, right, "k", compare_cols=["s"])))
        assert out["unchanged"] == 1 and out["changed"] == 0

    def test_identical_frames(self, spark):
        df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
        out = dict(rows(frame_diff(df, df, "k")))
        assert out == {"added": 0, "removed": 0, "changed": 0,
                       "unchanged": 2, "col:v": 0}


class TestMultilabel:
    def test_metrics(self, spark):
        df = spark.createDataFrame(
            [(["a", "b"], ["a", "b"]),     # exact
             (["a"], ["a", "b"]),          # jaccard 1/2
             (["c"], ["d"])],              # disjoint
            "pred array<string>, labels array<string>",
        )
        out = rows(multilabel_report(df, "pred", "labels"))[0]
        n, sa, mj, p, r, f1 = out
        assert n == 3
        assert sa == pytest.approx(1 / 3, abs=1e-6)
        assert mj == pytest.approx((1 + 0.5 + 0) / 3, abs=1e-6)
        assert p == pytest.approx(3 / 4, abs=1e-6)   # i=3, |pred|=4
        assert r == pytest.approx(3 / 5, abs=1e-6)   # |true|=5
        assert f1 == pytest.approx(2 * (3/4) * (3/5) / (3/4 + 3/5), abs=1e-6)

    def test_duplicates_and_nulls_are_set_semantics(self, spark):
        df = spark.createDataFrame(
            [(["a", "a", None], ["a"])],
            "pred array<string>, labels array<string>",
        )
        out = rows(multilabel_report(df, "pred", "labels"))[0]
        assert out[1] == 1.0 and out[2] == 1.0  # {a} == {a}

    def test_both_empty_is_perfect(self, spark):
        df = spark.createDataFrame(
            [([], []), (None, None)], "pred array<string>, labels array<string>"
        )
        out = rows(multilabel_report(df, "pred", "labels"))[0]
        assert out[1] == 1.0 and out[2] == 1.0
        assert out[3] is None and out[5] is None  # no label instances
