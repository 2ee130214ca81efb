"""Tests for profile_frame and weighted_quantile (q249-q250 operators)."""

import pytest

from polars_net_spark.operators.describe import profile_frame, weighted_quantile


def rows(lf):
    return lf.collect().rows()


class TestProfile:
    def test_counts_and_mode(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "b"), (4, None), (4, "a")],
            "id long, s string",
        )
        out = {r[0]: r for r in rows(profile_frame(df))}
        assert out["id"] == ("id", 5, 0, 4, "4", 2)
        col, n, n_null, nd, top, tc = out["s"]
        assert (n, n_null, nd, tc) == (5, 1, 2, 2)
        assert top == "a"  # tie a/b at 2 -> smallest string

    def test_all_null_column(self, spark):
        df = spark.createDataFrame([(None,), (None,)], "x string")
        out = rows(profile_frame(df))[0]
        assert out == ("x", 2, 2, 0, None, None)

    def test_column_subset_and_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "id long, s string")
        assert [r[0] for r in rows(profile_frame(df, ["s"]))] == ["s"]
        with pytest.raises(ValueError):
            profile_frame(df, [])


class TestWeightedQuantile:
    def test_global_exact(self, spark):
        # values 1..4 with weights 1,1,2,4 (W=8): cum 1,2,4,8
        df = spark.createDataFrame(
            [(1.0, 1.0), (2.0, 1.0), (3.0, 2.0), (4.0, 4.0)], "v double, w double"
        )
        out = dict(rows(weighted_quantile(df, "v", "w", [0.25, 0.5, 0.9])))
        assert out[0.25] == 2.0  # cum 2 >= 2
        assert out[0.5] == 3.0   # cum 4 >= 4
        assert out[0.9] == 4.0

    def test_uniform_weights_match_lower_quantile(self, spark):
        vals = list(range(1, 101))
        df = spark.createDataFrame([(float(v), 1.0) for v in vals], "v double, w double")
        out = dict(rows(weighted_quantile(df, "v", "w", [0.5, 0.99, 1.0])))
        assert out[0.5] == 50.0 and out[0.99] == 99.0 and out[1.0] == 100.0

    def test_per_key(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 1.0), ("a", 2.0, 3.0), ("b", 10.0, 1.0)],
            "k string, v double, w double",
        )
        out = {(r[0], r[1]): r[2] for r in rows(
            weighted_quantile(df, "v", "w", [0.25, 1.0], by="k"))}
        assert out[("a", 0.25)] == 1.0  # cum 1 >= 1
        assert out[("a", 1.0)] == 2.0
        assert out[("b", 1.0)] == 10.0

    def test_duplicate_values_pool_weight(self, spark):
        # ties accumulate before the crossing test (range window semantics)
        df = spark.createDataFrame(
            [(1.0, 1.0), (1.0, 1.0), (2.0, 2.0)], "v double, w double"
        )
        out = dict(rows(weighted_quantile(df, "v", "w", [0.5])))
        assert out[0.5] == 1.0

    def test_null_and_nonpositive_weights_drop(self, spark):
        df = spark.createDataFrame(
            [(1.0, 0.0), (2.0, None), (3.0, 1.0)], "v double, w double"
        )
        assert dict(rows(weighted_quantile(df, "v", "w", [1.0])))[1.0] == 3.0

    def test_bad_q_raises(self, spark):
        df = spark.createDataFrame([(1.0, 1.0)], "v double, w double")
        with pytest.raises(ValueError):
            weighted_quantile(df, "v", "w", [0.0])
        with pytest.raises(ValueError):
            weighted_quantile(df, "v", "w", [])
