"""Tests for label_propagation and holt_forecast (q251-q252 operators)."""

import datetime as dt

import pytest

from polars_net_spark.operators.ewm import holt_forecast
from polars_net_spark.operators.graph import label_propagation


def rows(lf):
    return lf.collect().rows()


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


class TestLabelPropagation:
    def test_two_communities(self, spark):
        edges = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = dict(rows(label_propagation(df, iterations=3)))
        # each triangle converges to its smallest member's label
        assert out[1] == out[2] == out[3] == 1
        assert out[4] == out[5] == out[6] == 4

    def test_deterministic_tiebreak(self, spark):
        # path 1-2-3: node 2 sees labels {1, 3} once each -> picks 1
        df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        out = dict(rows(label_propagation(df, iterations=1)))
        assert out[2] == 1
        assert out[1] == 2 and out[3] == 2  # leaves adopt their only neighbor

    def test_loops_and_duplicates_collapse(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 1), (1, 2)], "src long, dst long"
        )
        out = dict(rows(label_propagation(df, iterations=2)))
        assert set(out) == {1, 2}

    def test_checkpoint_dir(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
        )
        a = dict(rows(label_propagation(df, iterations=5, checkpoint_every=2)))
        b = dict(rows(label_propagation(
            df, iterations=5, checkpoint_every=2,
            checkpoint_dir=str(tmp_path / "ckpt"))))
        assert a == b
        assert any((tmp_path / "ckpt").rglob("*"))


class TestHolt:
    def test_recursion_matches_reference(self, spark):
        vals = [1.0, 2.0, 3.0, 4.0, 5.0]
        df = spark.createDataFrame(
            [("k", _ts(i), v) for i, v in enumerate(vals)],
            "k string, ts timestamp, v double",
        )
        out = rows(holt_forecast(df, "v", "ts", by="k", alpha=0.5, beta=0.25,
                                 horizon=1))[0]
        a, b = 0.5, 0.25
        l, tr = vals[0], vals[1] - vals[0]
        for x in vals[2:]:
            ln = a * x + (1 - a) * (l + tr)
            tr = b * (ln - l) + (1 - b) * tr
            l = ln
        assert out[1] == 5
        assert out[2] == pytest.approx(l, abs=1e-6)
        assert out[3] == pytest.approx(tr, abs=1e-6)
        assert out[4] == pytest.approx(l + tr, abs=1e-6)

    def test_two_points_is_init(self, spark):
        df = spark.createDataFrame(
            [("k", _ts(0), 3.0), ("k", _ts(1), 7.0)],
            "k string, ts timestamp, v double",
        )
        out = rows(holt_forecast(df, "v", "ts", by="k", horizon=3))[0]
        assert out[2] == 3.0 and out[3] == 4.0 and out[4] == 15.0

    def test_short_series_null(self, spark):
        df = spark.createDataFrame(
            [("k", _ts(0), 3.0)], "k string, ts timestamp, v double"
        )
        out = rows(holt_forecast(df, "v", "ts", by="k"))[0]
        assert out[1] == 1 and out[2] is None and out[4] is None

    def test_alpha_one_tracks_last_value(self, spark):
        df = spark.createDataFrame(
            [("k", _ts(i), float(v)) for i, v in enumerate([1, 2, 9, 4])],
            "k string, ts timestamp, v double",
        )
        out = rows(holt_forecast(df, "v", "ts", by="k", alpha=1.0, beta=0.0))[0]
        assert out[2] == 4.0 and out[3] == 1.0  # level = last x, trend frozen

    def test_bad_params_raise(self, spark):
        df = spark.createDataFrame(
            [("k", _ts(0), 1.0)], "k string, ts timestamp, v double"
        )
        with pytest.raises(ValueError):
            holt_forecast(df, "v", "ts", alpha=0.0)
        with pytest.raises(ValueError):
            holt_forecast(df, "v", "ts", beta=1.5)
