"""Tests for LazyFrame.grouping_sets and rfm_frame (q253-q254 operators)."""

import datetime as dt

import pytest

import polars_net_spark as pl
from polars_net_spark.operators.analytics import rfm_frame


def _lf(spark, data, schema):
    return pl.LazyFrame(spark.createDataFrame(data, schema))


class TestGroupingSets:
    def test_sets_and_null_fill(self, spark):
        lf = _lf(spark, [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)],
                 "g string, h string, v long")
        out = lf.grouping_sets([["g", "h"], ["g"], []]).agg(
            pl.col("v").sum().alias("s")
        ).collect().rows()
        d = {(r[0], r[1]): r[2] for r in out}
        assert d[("a", "x")] == 1 and d[("a", "y")] == 2 and d[("b", "x")] == 4
        assert d[("a", None)] == 3 and d[("b", None)] == 4  # set (g)
        assert d[(None, None)] == 7  # grand total
        assert len(out) == 6  # no (None, h) rows: set (h) not requested

    def test_single_set_equals_groupby(self, spark):
        lf = _lf(spark, [("a", 1), ("a", 2), ("b", 5)], "g string, v long")
        gs = dict(lf.grouping_sets([["g"]]).agg(pl.col("v").sum().alias("s"))
                  .collect().rows())
        gb = dict(lf.group_by("g").agg(pl.col("v").sum().alias("s"))
                  .collect().rows())
        assert gs == gb


class TestRfm:
    def _events(self, spark):
        rows = []
        eid = 0
        # 5 users with increasing activity/value; user u5 most recent+valuable
        for i, u in enumerate(["u1", "u2", "u3", "u4", "u5"]):
            for j in range(i + 1):
                rows.append((u, dt.datetime(2024, 1, 1 + i, 0, j), float(10 * (i + 1))))
                eid += 1
        return spark.createDataFrame(rows, "user_id string, ts timestamp, value double")

    def test_scores_monotone(self, spark):
        out = {r[0]: r for r in
               rfm_frame(self._events(spark), "user_id", "ts", "value",
                         n_bins=5).collect().rows()}
        # u5: most recent, most frequent, highest value -> 555
        assert out["u5"][7] == "555"
        assert out["u1"][4] == 1 and out["u1"][5] == 1 and out["u1"][6] == 1
        # recency_days of u5 is 0 (as_of = max date)
        assert out["u5"][1] == 0 and out["u1"][1] == 4
        assert out["u3"][2] == 3  # frequency

    def test_explicit_as_of(self, spark):
        out = {r[0]: r for r in
               rfm_frame(self._events(spark), "user_id", "ts", "value",
                         as_of="2024-01-10").collect().rows()}
        assert out["u5"][1] == 5 and out["u1"][1] == 9

    def test_null_values_null_monetary(self, spark):
        df = spark.createDataFrame(
            [("u1", dt.datetime(2024, 1, 1), None),
             ("u2", dt.datetime(2024, 1, 2), 5.0)],
            "user_id string, ts timestamp, value double",
        )
        out = {r[0]: r for r in
               rfm_frame(df, "user_id", "ts", "value", n_bins=2).collect().rows()}
        assert out["u1"][3] is None and out["u1"][6] is None and out["u1"][7] is None
        assert out["u2"][7] is not None

    def test_bad_bins_raise(self, spark):
        df = spark.createDataFrame(
            [("u", dt.datetime(2024, 1, 1), 1.0)],
            "user_id string, ts timestamp, value double",
        )
        with pytest.raises(ValueError):
            rfm_frame(df, "user_id", "ts", "value", n_bins=1)


class TestCohortValue:
    def test_triangle(self, spark):
        import datetime as dt
        from polars_net_spark.operators.analytics import cohort_value

        ev = spark.createDataFrame(
            [("u1", dt.datetime(2024, 1, 1), 10.0),   # week 0 (Mon)
             ("u1", dt.datetime(2024, 1, 9), 5.0),    # week 1
             ("u2", dt.datetime(2024, 1, 2), 2.0),    # same cohort, week 0
             ("u3", dt.datetime(2024, 1, 9), None)],  # cohort 2, null value
            "u string, ts timestamp, v double",
        )
        out = {(str(r[0]), r[1]): r for r in
               cohort_value(ev, "u", "ts", "v").collect().rows()}
        w0 = out[("2024-01-01", 0)]
        assert w0[2] == 2 and w0[3] == 12.0 and w0[4] == 12.0
        w1 = out[("2024-01-01", 1)]
        assert w1[2] == 1 and w1[3] == 5.0 and w1[4] == 17.0  # cumulative
        c2 = out[("2024-01-08", 0)]
        assert c2[2] == 1 and c2[3] == 0.0  # null value = activity, zero value

    def test_bad_period(self, spark):
        from polars_net_spark.operators.analytics import cohort_value
        df = spark.createDataFrame([("u", None, 1.0)], "u string, ts timestamp, v double")
        import pytest as _pt
        with _pt.raises(ValueError):
            cohort_value(df, "u", "ts", "v", period="hour")


class TestPopAndSequences:
    def test_period_over_period(self, spark):
        import datetime as dt
        from polars_net_spark.operators.analytics import period_over_period

        ev = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1), 10.0), (dt.datetime(2024, 1, 2), 10.0),
             (dt.datetime(2024, 2, 1), 30.0), (dt.datetime(2024, 3, 1), None)],
            "ts timestamp, v double",
        )
        out = {str(r[0]): r for r in
               period_over_period(ev, "ts", "v", every="month").collect().rows()}
        jan = out["2024-01-01"]
        assert jan[1] == 20.0 and jan[2] is None and jan[4] is None
        feb = out["2024-02-01"]
        assert feb[2] == 20.0 and feb[3] == 10.0 and feb[4] == 0.5
        mar = out["2024-03-01"]
        assert mar[1] == 0.0 and mar[4] == -1.0  # null value = zero mass

    def test_frequent_sequences(self, spark):
        import datetime as dt
        from polars_net_spark.operators.analytics import frequent_sequences

        def t(m):
            return dt.datetime(2024, 1, 1, 0, m)

        rows_ = []
        eid = 0
        for u in ("u1", "u2", "u3"):
            for i, s in enumerate(["a", "b", "c", "a", "b"]):
                rows_.append((u, eid, t(i), s)); eid += 1
        ev = spark.createDataFrame(
            rows_, "u string, eid long, ts timestamp, s string"
        )
        out = {(r[0], r[1], r[2]): r[3] for r in frequent_sequences(
            ev, "s", "ts", by="u", length=3, min_count=3,
            tie_cols=["eid"]).collect().rows()}
        assert out[("a", "b", "c")] == 3
        assert out[("b", "c", "a")] == 3 and out[("c", "a", "b")] == 3
        assert len(out) == 3  # boundary runs never cross users

    def test_sequence_validation(self, spark):
        from polars_net_spark.operators.analytics import frequent_sequences
        df = spark.createDataFrame([("u", None, "a")], "u string, ts timestamp, s string")
        import pytest as _pt
        with _pt.raises(ValueError):
            frequent_sequences(df, "s", "ts", length=1)
