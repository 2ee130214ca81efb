"""Round-9 batch 5: stickiness_report, power_user_curve, chrf_corpus,
edit_distance_report."""
import datetime as dt
import math

import pytest

from polars_net_spark.llm.evaluation import chrf_corpus
from polars_net_spark.operators.analytics import power_user_curve, stickiness_report


def rows(lf):
    return [tuple(r) for r in lf.spark.collect()]


class TestStickiness:
    def test_known_ratio(self, spark):
        # Jan: u1 active all 4 observed days, u2 active 1 day
        base = dt.datetime(2024, 1, 1)
        data = [(base + dt.timedelta(days=d), 1) for d in range(4)] + [
            (base + dt.timedelta(days=2), 2)
        ]
        d = spark.createDataFrame(data, "ts timestamp, user_id long")
        (month, nd, avg_dau, mau, st), = rows(stickiness_report(d, "ts", "user_id"))
        assert nd == 4 and mau == 2
        assert abs(avg_dau - 5 / 4) < 1e-6 and abs(st - 5 / 8) < 1e-6

    def test_duplicate_events_collapse(self, spark):
        base = dt.datetime(2024, 3, 1)
        data = [(base, 1)] * 10 + [(base + dt.timedelta(hours=3), 1)] * 5
        d = spark.createDataFrame(data, "ts timestamp, user_id long")
        (month, nd, avg_dau, mau, st), = rows(stickiness_report(d, "ts", "user_id"))
        assert nd == 1 and avg_dau == 1.0 and mau == 1 and st == 1.0

    def test_multi_month(self, spark):
        d = spark.createDataFrame(
            [(dt.datetime(2024, 1, 5), 1), (dt.datetime(2024, 2, 5), 1)],
            "ts timestamp, user_id long",
        )
        out = rows(stickiness_report(d, "ts", "user_id"))
        assert len(out) == 2 and out[0][0] < out[1][0]


class TestPowerUserCurve:
    def test_histogram(self, spark):
        base = dt.datetime(2024, 1, 1)
        data = []
        # 3 users active 1 day, 2 users active 3 days
        for u in (1, 2, 3):
            data.append((base, u))
        for u in (4, 5):
            for k in range(3):
                data.append((base + dt.timedelta(days=k), u))
        d = spark.createDataFrame(data, "ts timestamp, user_id long").repartition(4)
        out = rows(power_user_curve(d, "ts", "user_id"))
        assert out == [(1, 3, 0.6), (3, 2, 0.4)]


class TestChrf:
    def test_identical_is_one(self, spark):
        d = spark.createDataFrame(
            [(1, "hello there world", "hello there world")],
            "id int, hyp string, ref string",
        )
        (chrf, pm, rm, nd), = rows(chrf_corpus(d, "hyp", "ref", "id"))
        assert chrf == 1.0 and pm == 1.0 and rm == 1.0

    def test_matches_brute_force(self, spark):
        hyp, ref = "abcdef", "abcxef"
        h2, r2 = hyp.replace(" ", ""), ref.replace(" ", "")

        def grams(s, n):
            return [s[i:i + n] for i in range(len(s) - n + 1)]

        ps, rs = [], []
        for n in range(1, 7):
            from collections import Counter

            hc, rc = Counter(grams(h2, n)), Counter(grams(r2, n))
            m = sum(min(hc[g], rc[g]) for g in hc)
            if sum(hc.values()) > 0:
                ps.append(m / sum(hc.values()))
            if sum(rc.values()) > 0:
                rs.append(m / sum(rc.values()))
        pm_ref, rm_ref = sum(ps) / len(ps), sum(rs) / len(rs)
        f_ref = 5 * pm_ref * rm_ref / (4 * pm_ref + rm_ref)
        d = spark.createDataFrame([(1, hyp, ref)], "id int, hyp string, ref string")
        (chrf, pm, rm, nd), = rows(chrf_corpus(d, "hyp", "ref", "id"))
        assert abs(pm - pm_ref) < 1e-6 and abs(rm - rm_ref) < 1e-6
        assert abs(chrf - f_ref) < 1e-6

    def test_whitespace_stripped(self, spark):
        d = spark.createDataFrame(
            [(1, "ab cd", "abcd")], "id int, hyp string, ref string"
        )
        (chrf, pm, rm, nd), = rows(chrf_corpus(d, "hyp", "ref", "id", max_n=2))
        assert chrf == 1.0

