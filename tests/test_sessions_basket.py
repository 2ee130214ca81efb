"""Tests for sessionize/session_summary, association_rules, cuped_report,
and triangle_count (q239-q242 operators)."""

import datetime as dt

import pytest

from polars_net_spark.operators.analytics import session_summary, sessionize
from polars_net_spark.operators.basket import association_rules
from polars_net_spark.operators.graph import triangle_count
from polars_net_spark.operators.regression import cuped_report


def rows(lf):
    return lf.collect().rows()


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


class TestSessionize:
    def _frame(self, spark):
        # u1: events at 0, 10, 50 min (gap 40 > 30 splits), u2: one event
        return spark.createDataFrame(
            [
                ("u1", 1, _ts(0)),
                ("u1", 2, _ts(10)),
                ("u1", 3, _ts(50)),
                ("u2", 4, _ts(5)),
            ],
            "u string, eid long, ts timestamp",
        )

    def test_session_ids(self, spark):
        out = rows(
            sessionize(self._frame(spark), "ts", by="u", gap="30 minutes",
                       tie_cols=["eid"])
        )
        ids = {(r[0], r[1]): r[3] for r in out}
        assert ids[("u1", 1)] == 1 and ids[("u1", 2)] == 1
        assert ids[("u1", 3)] == 2  # 40-min silence opens session 2
        assert ids[("u2", 4)] == 1

    def test_gap_boundary_is_exclusive(self, spark):
        # exactly-30-min gap does NOT split (strict > contract)
        df = spark.createDataFrame(
            [("u", 1, _ts(0)), ("u", 2, _ts(30))], "u string, eid long, ts timestamp"
        )
        out = rows(sessionize(df, "ts", by="u", gap="30 minutes", tie_cols=["eid"]))
        assert {r[3] for r in out} == {1}

    def test_summary(self, spark):
        out = {
            (r[0], r[1]): r
            for r in rows(
                session_summary(self._frame(spark), "ts", by="u",
                                gap="30 minutes", tie_cols=["eid"])
            )
        }
        assert out[("u1", 1)][4] == 2  # n_events
        assert out[("u1", 1)][5] == 600.0  # duration_seconds
        assert out[("u1", 2)][4] == 1 and out[("u1", 2)][5] == 0.0
        assert out[("u2", 1)][4] == 1

    def test_global_path_distributed_no_warning(self, spark):
        # by=None on a temporal ts rides halo buckets + prefix offsets:
        # no single-partition warning, exact results
        import warnings

        df = spark.createDataFrame(
            [(1, _ts(0)), (2, _ts(10)), (3, _ts(50)), (4, _ts(55))],
            "eid long, ts timestamp",
        ).repartition(3)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            out = rows(sessionize(df, "ts", tie_cols=["eid"]))
        ids = {r[0]: r[2] for r in out}
        assert ids == {1: 1, 2: 1, 3: 2, 4: 2}

    def test_global_path_string_ts_falls_back_and_warns(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00")], "eid long, ts string"
        )
        with pytest.warns(UserWarning, match="single global-window"):
            rows(sessionize(df, "ts", tie_cols=["eid"]))


class TestAssociationRules:
    def test_counts_and_metrics(self, spark):
        # baskets: {a,b} x3, {a,c}, {b}, duplicate (1,a) row collapses
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"),
             (3, "a"), (3, "b"), (4, "a"), (4, "c"), (5, "b")],
            "b long, i string",
        )
        out = {
            (r[0], r[1]): r
            for r in rows(association_rules(df, "b", "i", min_support=0.2))
        }
        r = out[("a", "b")]
        assert r[2] == 3 and r[3] == 0.6  # n_pair, support 3/5
        assert r[4] == 0.75  # confidence 3/4
        assert r[5] == pytest.approx(0.75 * 5 / 4)  # lift
        rb = out[("b", "a")]
        assert rb[2] == 3 and rb[4] == 0.75 and rb[5] == r[5]
        # {a,c}: support 1/5 = 0.2 meets min_support
        assert out[("a", "c")][2] == 1

    def test_apriori_prune_drops_rare_items(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (1, "z")], "b long, i string"
        )
        out = rows(association_rules(df, "b", "i", min_support=0.9))
        assert {(r[0], r[1]) for r in out} == {("a", "b"), ("b", "a")}

    def test_min_confidence_filters_direction(self, spark):
        # a in 4 baskets, b in 2, both-in-2: conf a->b = .5, b->a = 1.0
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "a"), (4, "a"),
             (1, "b"), (2, "b")],
            "b long, i string",
        )
        out = rows(association_rules(df, "b", "i", min_support=0.1,
                                     min_confidence=0.9))
        assert [(r[0], r[1]) for r in out] == [("b", "a")]

    def test_max_items_cap(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (1, "c")], "b long, i string"
        )
        out = rows(association_rules(df, "b", "i", min_support=0.1,
                                     max_items_per_basket=2))
        # sorted basket [a,b,c] truncates to [a,b]: only the (a,b) pair
        assert {(r[0], r[1]) for r in out} == {("a", "b"), ("b", "a")}


class TestCuped:
    def test_perfectly_correlated_covariate(self, spark):
        # y = 2x + group shift: adjusted variance collapses to ~0
        data = [("t", float(2 * x + 10), float(x)) for x in range(1, 9)] + [
            ("c", float(2 * x), float(x)) for x in range(1, 9)
        ]
        df = spark.createDataFrame(data, "g string, y double, x double")
        out = {r[0]: r for r in rows(cuped_report(df, "y", "x", "g"))}
        assert out["t"][2] == pytest.approx(2.0)  # theta
        assert out["t"][6] == pytest.approx(0.0, abs=1e-9)  # var_adj
        assert out["t"][7] == pytest.approx(1.0, abs=1e-9)  # var_reduction
        # adjusted means keep the true +10 effect
        assert out["t"][4] - out["c"][4] == pytest.approx(10.0)

    def test_uncorrelated_covariate_is_noop(self, spark):
        data = [("t", 1.0, 1.0), ("t", 3.0, 2.0), ("t", 1.0, 2.0),
                ("t", 3.0, 1.0), ("c", 2.0, 1.0), ("c", 4.0, 2.0),
                ("c", 2.0, 2.0), ("c", 4.0, 1.0)]
        df = spark.createDataFrame(data, "g string, y double, x double")
        out = {r[0]: r for r in rows(cuped_report(df, "y", "x", "g"))}
        assert out["t"][2] == pytest.approx(0.0, abs=1e-12)  # theta = 0
        assert out["t"][5] == out["t"][6]  # var unchanged

    def test_null_rows_drop(self, spark):
        df = spark.createDataFrame(
            [("t", 1.0, 1.0), ("t", 2.0, 2.0), ("t", None, 3.0),
             ("c", 9.0, None), ("c", 1.0, 1.0), ("c", 2.0, 2.0)],
            "g string, y double, x double",
        )
        out = {r[0]: r for r in rows(cuped_report(df, "y", "x", "g"))}
        assert out["t"][1] == 2 and out["c"][1] == 2


class TestTriangleCount:
    def test_k4_has_four_triangles(self, spark):
        edges = [(a, b) for a in range(4) for b in range(4) if a < b]
        df = spark.createDataFrame(edges, "src long, dst long")
        assert rows(triangle_count(df))[0][0] == 4
        per = dict(rows(triangle_count(df, per_node=True)))
        assert per == {0: 3, 1: 3, 2: 3, 3: 3}

    def test_dups_loops_and_reversals_collapse(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (1, 3), (3, 3), (1, 2), (4, 1)],
            "src long, dst long",
        )
        assert rows(triangle_count(df))[0][0] == 1
        per = dict(rows(triangle_count(df, per_node=True)))
        assert per == {1: 1, 2: 1, 3: 1, 4: 0}

    def test_triangle_free_graph(self, spark):
        df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
        assert rows(triangle_count(df))[0][0] == 0

    def test_two_shared_edge_triangles(self, spark):
        # triangles (1,2,3) and (1,2,4) share edge (1,2)
        df = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)], "src long, dst long"
        )
        assert rows(triangle_count(df))[0][0] == 2
        per = dict(rows(triangle_count(df, per_node=True)))
        assert per == {1: 2, 2: 2, 3: 1, 4: 1}
