"""Tests for attribution_frame and rake_keywords (q247-q248 operators)."""

import datetime as dt

import pytest

from polars_net_spark.llm.retrieval import rake_keywords
from polars_net_spark.operators.analytics import attribution_frame


def rows(lf):
    return lf.collect().rows()


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


def _events(spark, data):
    return spark.createDataFrame(
        data, "user_id string, event_id long, ts timestamp, event_type string"
    )


class TestAttribution:
    def test_models(self, spark):
        ev = _events(spark, [
            ("u1", 1, _ts(0), "view"), ("u1", 2, _ts(5), "click"),
            ("u1", 3, _ts(10), "purchase"),
            ("u1", 4, _ts(20), "view"), ("u1", 5, _ts(30), "purchase"),
            ("u2", 6, _ts(0), "click"), ("u2", 7, _ts(1), "view"),
        ])
        out = {r[0]: r for r in rows(attribution_frame(
            ev, "ts", "user_id", "event_type", "purchase",
            touch_types=["view", "click"], tie_cols=["event_id"]))}
        assert out["view"][1] == 2.0 and out["view"][2] == 1.0
        assert out["view"][3] == pytest.approx(1.5)
        assert out["click"][1] == 0.0 and out["click"][2] == 1.0
        assert out["click"][3] == pytest.approx(0.5)

    def test_touches_do_not_cross_conversions(self, spark):
        # the view before purchase #1 must not also credit purchase #2
        ev = _events(spark, [
            ("u", 1, _ts(0), "view"), ("u", 2, _ts(1), "purchase"),
            ("u", 3, _ts(2), "purchase"),
        ])
        out = rows(attribution_frame(
            ev, "ts", "user_id", "event_type", "purchase",
            tie_cols=["event_id"]))
        assert out == [("view", 1.0, 1.0, 1.0)]

    def test_lookback_window(self, spark):
        ev = _events(spark, [
            ("u", 1, _ts(0), "view"), ("u", 2, _ts(50), "click"),
            ("u", 3, _ts(55), "purchase"),
        ])
        out = rows(attribution_frame(
            ev, "ts", "user_id", "event_type", "purchase",
            lookback="10 minutes", tie_cols=["event_id"]))
        # the view at t0 is outside the 10-min lookback
        assert out == [("click", 1.0, 1.0, 1.0)]

    def test_touches_after_last_conversion_drop(self, spark):
        ev = _events(spark, [
            ("u", 1, _ts(0), "purchase"), ("u", 2, _ts(5), "view"),
        ])
        assert rows(attribution_frame(
            ev, "ts", "user_id", "event_type", "purchase",
            tie_cols=["event_id"])) == []


class TestRake:
    def test_classic_scoring(self, spark):
        df = spark.createDataFrame(
            [(1, "Deep learning models are powerful, and deep learning scales well.")],
            "doc_id long, text string",
        )
        out = rows(rake_keywords(df, top_k=5))
        by_phrase = {r[1]: r for r in out}
        # deg/freq: deep 7/2, learning 7/2, scales 4, well 4, models 3
        assert by_phrase["deep learning scales well"][3] == pytest.approx(15.0)
        assert by_phrase["deep learning models"][3] == pytest.approx(10.0)
        assert by_phrase["powerful"][3] == pytest.approx(1.0)
        assert [r[1] for r in out][:2] == [
            "deep learning scales well", "deep learning models"]

    def test_repeated_phrase_scores_once(self, spark):
        # "red widget" twice: deg(red)=deg(widget)=4, freq=2 -> score 4
        df = spark.createDataFrame(
            [(1, "red widget. red widget.")], "doc_id long, text string"
        )
        out = rows(rake_keywords(df))
        assert len(out) == 1
        assert out[0][1] == "red widget" and out[0][3] == pytest.approx(4.0)

    def test_consecutive_stopwords_split(self, spark):
        df = spark.createDataFrame(
            [(1, "quick fox of the lazy dog")], "doc_id long, text string"
        )
        phrases = {r[1] for r in rows(rake_keywords(df))}
        assert phrases == {"quick fox", "lazy dog"}

    def test_max_words_drops_long_runs(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
        )
        assert rows(rake_keywords(df, max_words=4)) == []
        assert len(rows(rake_keywords(df, max_words=5))) == 1

    def test_custom_stopwords_and_topk(self, spark):
        df = spark.createDataFrame(
            [(1, "x STOP y STOP z w")], "doc_id long, text string"
        )
        out = rows(rake_keywords(df, stopwords=["stop"], top_k=2))
        assert len(out) == 2
        assert out[0][1] == "z w" and out[0][4] == 1  # 2-word phrase wins


class TestFunnelTiming:
    def test_delays(self, spark):
        import datetime as dt
        from polars_net_spark.operators.analytics import funnel_timing

        def t(m):
            return dt.datetime(2024, 1, 1, 0, m)

        ev = spark.createDataFrame(
            [("u1", t(0), "a"), ("u1", t(10), "b"), ("u1", t(40), "c"),
             ("u2", t(0), "a"), ("u2", t(20), "b"),
             ("u3", t(5), "b")],  # b before any a: no conversion
            "u string, ts timestamp, s string",
        )
        out = {(r[0], r[1]): r for r in
               funnel_timing(ev, "u", "ts", "s", ["a", "b", "c"]).collect().rows()}
        ab = out[("a", "b")]
        assert ab[2] == 2 and ab[3] == pytest.approx((600 + 1200) / 2)
        assert ab[4] == pytest.approx(900.0)  # median of 600, 1200
        bc = out[("b", "c")]
        assert bc[2] == 1 and bc[3] == pytest.approx(1800.0)

    def test_greedy_earliest_ordering(self, spark):
        import datetime as dt
        from polars_net_spark.operators.analytics import funnel_timing

        def t(m):
            return dt.datetime(2024, 1, 1, 0, m)

        # b occurs before AND after a: the walk picks the one after a
        ev = spark.createDataFrame(
            [("u", t(0), "b"), ("u", t(10), "a"), ("u", t(30), "b")],
            "u string, ts timestamp, s string",
        )
        out = funnel_timing(ev, "u", "ts", "s", ["a", "b"]).collect().rows()
        assert len(out) == 1 and out[0][3] == pytest.approx(1200.0)

    def test_requires_two_steps(self, spark):
        from polars_net_spark.operators.analytics import funnel_timing
        df = spark.createDataFrame([("u", None, "a")], "u string, ts timestamp, s string")
        with pytest.raises(ValueError):
            funnel_timing(df, "u", "ts", "s", ["a"])
