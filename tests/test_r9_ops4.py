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

    def test_high_orders_route_string_fold(self, spark):
        # r11: max_n back up to 10 (ADVICE) — orders > 7 exceed the
        # packed-long budget and must take the exact string fold; verify
        # max_n=9 against brute force on an ASCII pair (which would hit
        # the fast path for n <= 7 and the slow path for n in 8..9)
        from collections import Counter

        hyp, ref = "the quick brown fox", "the quick brown cat"
        h2, r2 = "".join(hyp.split()), "".join(ref.split())

        def grams(s, n):
            return [s[i:i + n] for i in range(len(s) - n + 1)]

        mx = 9
        ps, rs = [], []
        for n in range(1, mx + 1):
            hc, rc = Counter(grams(h2, n)), Counter(grams(r2, n))
            m = sum(min(hc[g], rc[g]) for g in hc)
            if sum(hc.values()) > 0:
                ps.append(m / sum(hc.values()))
            if sum(rc.values()) > 0:
                rs.append(m / sum(rc.values()))
        pm_ref, rm_ref = sum(ps) / len(ps), sum(rs) / len(rs)
        f_ref = 5 * pm_ref * rm_ref / (4 * pm_ref + rm_ref)
        d = spark.createDataFrame([(1, hyp, ref)], "id int, hyp string, ref string")
        (chrf, pm, rm, nd), = rows(chrf_corpus(d, "hyp", "ref", "id", max_n=mx))
        assert abs(pm - pm_ref) < 1e-6 and abs(rm - rm_ref) < 1e-6
        assert abs(chrf - f_ref) < 1e-6
        import pytest as _pytest
        with _pytest.raises(ValueError):
            chrf_corpus(d, "hyp", "ref", "id", max_n=11)

    def test_whitespace_stripped(self, spark):
        d = spark.createDataFrame(
            [(1, "ab cd", "abcd")], "id int, hyp string, ref string"
        )
        (chrf, pm, rm, nd), = rows(chrf_corpus(d, "hyp", "ref", "id", max_n=2))
        assert chrf == 1.0


    def test_non_latin1_fallback_matches_brute_force(self, spark):
        # codepoints >= 256 must route to the exact string-fold branch and
        # agree with brute force; mixed corpora exercise BOTH branches
        cases = [
            (1, "漢字テキスト abc", "漢字テキスト abd"),
            (2, "plain ascii row", "plain ascii row too"),
            (3, "čërvená říčka", "červená řeka"),
        ]
        from collections import Counter

        def grams(s, n):
            return [s[i:i + n] for i in range(len(s) - n + 1)]

        mx = 4
        ps, rs = [], []
        M = [0] * (mx + 1)
        H = [0] * (mx + 1)
        R = [0] * (mx + 1)
        for _, hyp, ref in cases:
            h2 = "".join(hyp.split())
            r2 = "".join(ref.split())
            for n in range(1, mx + 1):
                hc, rc = Counter(grams(h2, n)), Counter(grams(r2, n))
                M[n] += sum(min(hc[g], rc[g]) for g in hc)
                H[n] += sum(hc.values())
                R[n] += sum(rc.values())
        for n in range(1, mx + 1):
            if H[n] > 0:
                ps.append(M[n] / H[n])
            if R[n] > 0:
                rs.append(M[n] / R[n])
        pm_ref, rm_ref = sum(ps) / len(ps), sum(rs) / len(rs)
        f_ref = 5 * pm_ref * rm_ref / (4 * pm_ref + rm_ref)
        d = spark.createDataFrame(cases, "id int, hyp string, ref string")
        (chrf, pm, rm, nd), = rows(chrf_corpus(d, "hyp", "ref", "id", max_n=4))
        assert nd == 3
        assert abs(pm - pm_ref) < 1e-6 and abs(rm - rm_ref) < 1e-6
        assert abs(chrf - f_ref) < 1e-6

    def test_empty_and_short_strings(self, spark):
        # empty hyp: zero grams on that side at every order — must not
        # fabricate phantom grams (sequence(1, 0) descends in Spark)
        d = spark.createDataFrame(
            [(1, "", "abc"), (2, "ab", "ab")], "id int, hyp string, ref string"
        )
        (chrf, pm, rm, nd), = rows(chrf_corpus(d, "hyp", "ref", "id", max_n=3))
        assert nd == 2
        # order 1: m=2 (ab), h=2, r=5 ; order 2: m=1 (ab), h=1, r=3
        # order 3: h=0 -> skipped from precision; r=1, m=0
        assert abs(pm - (2 / 2 + 1 / 1) / 2) < 1e-6
        assert abs(rm - (2 / 5 + 1 / 3 + 0 / 1) / 3) < 1e-6
