"""Model-evaluation family (operators/mleval.py) + weighted quantiles /
Theil / RMST (operators/analytics.py) — the round-8 q304-q310 operators."""

import math

import pytest

from polars_net_spark.operators.analytics import (
    rmst,
    theil_index,
    weighted_quantiles,
)
from polars_net_spark.operators.mleval import (
    auc_report,
    calibration_report,
    gains_chart,
    reliability_bins,
)


def rows(lf):
    return lf.collect().rows()


class TestAuc:
    def test_perfect_separation(self, spark):
        d = spark.createDataFrame(
            [(float(i), 1 if i >= 5 else 0) for i in range(10)], "s double, y int"
        )
        (auc, gini, npos, nneg), = rows(auc_report(d, "s", "y"))
        assert auc == 1.0 and gini == 1.0 and npos == 5 and nneg == 5

    def test_random_is_half_with_ties(self, spark):
        # constant score: every pair is a tie -> AUC exactly 0.5
        d = spark.createDataFrame([(1.0, i % 2) for i in range(40)], "s double, y int")
        (auc, gini, npos, nneg), = rows(auc_report(d, "s", "y"))
        assert auc == 0.5 and gini == 0.0

    def test_matches_sklearn_formula(self, spark):
        import numpy as np

        rng = np.random.RandomState(5)
        s = rng.rand(500)
        y = (rng.rand(500) < s).astype(int)  # score is informative
        d = spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(s, y)], "s double, y int"
        ).repartition(7)
        (auc, _, npos, nneg), = rows(auc_report(d, "s", "y"))
        # reference: Mann-Whitney U by explicit pair counting
        pos, neg = s[y == 1], s[y == 0]
        u = sum((pos_v > neg).sum() + 0.5 * (pos_v == neg).sum() for pos_v in pos)
        assert abs(auc - u / (len(pos) * len(neg))) < 1e-6

    def test_single_class_null(self, spark):
        d = spark.createDataFrame([(1.0, 1), (2.0, 1)], "s double, y int")
        (auc, gini, npos, nneg), = rows(auc_report(d, "s", "y"))
        assert auc is None and nneg == 0


class TestCalibration:
    def test_perfectly_calibrated_bins(self, spark):
        # p = 0.25 with 25% positives, p = 0.75 with 75% positives
        data = [(0.25, 1 if i < 25 else 0) for i in range(100)] + [
            (0.75, 1 if i < 75 else 0) for i in range(100)
        ]
        d = spark.createDataFrame(data, "p double, y int")
        out = {r[0]: r for r in rows(reliability_bins(d, "p", "y", 10))}
        assert out[2][5] == 0.25 and out[7][5] == 0.75  # frac_pos
        assert out[2][6] == 0.0 and out[7][6] == 0.0  # gap
        (n, brier, ece, mce, hl, df), = rows(calibration_report(d, "p", "y", 10))
        assert n == 200 and ece == 0.0 and mce == 0.0 and hl == 0.0
        assert abs(brier - (0.25 * 0.75)) < 1e-9  # p(1-p) for calibrated bins

    def test_clipping_and_top_bin(self, spark):
        d = spark.createDataFrame(
            [(1.0, 1), (1.2, 1), (-0.1, 0)], "p double, y int"
        )
        out = {r[0]: r for r in rows(reliability_bins(d, "p", "y", 10))}
        assert out[9][3] == 2  # p=1.0 and clipped 1.2 both in top bin
        assert out[0][3] == 1  # clipped -0.1 in bottom bin


class TestGains:
    def test_deciles_and_cumulative(self, spark):
        # positives exactly in the top 20 scores
        d = spark.createDataFrame(
            [(float(i), 1 if i >= 80 else 0, i) for i in range(100)],
            "s double, y int, id long",
        ).repartition(5)
        out = rows(gains_chart(d, "s", "y", "id", n_buckets=10))
        assert [r[0] for r in out] == list(range(10))
        assert all(r[1] == 10 for r in out)  # exact slices
        assert out[0][2] == 10 and out[1][2] == 10  # top two deciles all pos
        assert out[0][4] == 0.5 and out[1][4] == 1.0  # cumulative share
        assert out[0][5] == 5.0  # lift = 1.0 / 0.2
        assert out[9][2] == 0

    def test_tie_break_deterministic(self, spark):
        d = spark.createDataFrame(
            [(1.0, i % 2, i) for i in range(20)], "s double, y int, id long"
        )
        a = rows(gains_chart(d, "s", "y", "id", n_buckets=4))
        b = rows(gains_chart(d.repartition(7), "s", "y", "id", n_buckets=4))
        assert a == b


class TestTheil:
    def test_uniform_is_zero(self, spark):
        d = spark.createDataFrame([(5.0,)] * 50, "x double")
        (n, nexc, mean, theil), = rows(theil_index(d, "x"))
        assert n == 50 and nexc == 0 and mean == 5.0 and abs(theil) < 1e-9

    def test_concentration_approaches_ln_n(self, spark):
        d = spark.createDataFrame([(1e9,)] + [(1e-6,)] * 9, "x double")
        (n, _, _, theil), = rows(theil_index(d, "x"))
        assert abs(theil - math.log(10)) < 1e-3

    def test_nonpositive_excluded(self, spark):
        d = spark.createDataFrame([(2.0,), (0.0,), (-1.0,), (None,)], "x double")
        (n, nexc, mean, theil), = rows(theil_index(d, "x"))
        assert n == 1 and nexc == 3 and theil == 0.0


class TestWeightedQuantiles:
    def test_weighted_median_shifts(self, spark):
        # value 10 carries 90% of the weight -> every q <= 0.9 returns 10
        d = spark.createDataFrame([(10.0, 90.0), (20.0, 10.0)], "v double, w double")
        out = {r[0]: r[1] for r in rows(weighted_quantiles(d, "v", "w", (0.5, 0.9, 1.0)))}
        assert out[0.5] == 10.0 and out[0.9] == 10.0 and out[1.0] == 20.0

    def test_unit_weights_match_classic(self, spark):
        d = spark.createDataFrame([(float(v), 1.0) for v in range(1, 101)], "v double, w double")
        out = {r[0]: r[1] for r in rows(weighted_quantiles(d, "v", "w", (0.25, 0.5)))}
        assert out[0.25] == 25.0 and out[0.5] == 50.0

    def test_validation(self, spark):
        d = spark.createDataFrame([(1.0, 1.0)], "v double, w double")
        with pytest.raises(ValueError):
            weighted_quantiles(d, "v", "w", (0.0, 0.5))
        with pytest.raises(ValueError):
            weighted_quantiles(d.filter("v > 5"), "v", "w")


class TestRmst:
    def test_no_events_full_horizon(self, spark):
        # all censored: S = 1 everywhere, RMST = tau
        d = spark.createDataFrame([(float(t), 0) for t in (5, 10)], "t double, e int")
        (tau, n_times, val), = rows(rmst(d, "t", "e", tau=20.0))
        assert val == 20.0

    def test_all_die_at_t5(self, spark):
        # S = 1 until 5 then 0: RMST(20) = 5
        d = spark.createDataFrame([(5.0, 1)] * 4, "t double, e int")
        (tau, n_times, val), = rows(rmst(d, "t", "e", tau=20.0))
        assert val == 5.0

    def test_keyed_matches_global_single_key(self, spark):
        data = [("k", float((i * 7) % 40 + 1), 1 if i % 3 else 0) for i in range(200)]
        d = spark.createDataFrame(data, "g string, t double, e int").repartition(6)
        (keyed,) = rows(rmst(d, "t", "e", tau=30.0, by="g"))
        (glob,) = rows(rmst(d, "t", "e", tau=30.0))
        assert keyed[1:] == glob  # drop the key column


class TestGroupAuc:
    def test_per_key_matches_global(self, spark):
        import numpy as np

        from polars_net_spark.operators.mleval import group_auc

        rng = np.random.RandomState(9)
        data = [
            ("a", float(s), int(rng.rand() < s))
            for s in rng.rand(300)
        ] + [("b", float(s), int(rng.rand() > s)) for s in rng.rand(300)]
        d = spark.createDataFrame(data, "g string, s double, y int").repartition(6)
        out = {r[0]: r[1] for r in rows(group_auc(d, "s", "y", by="g"))}
        # key a: score is positively informative; key b: anti-informative
        assert out["a"] > 0.6 and out["b"] < 0.4
        # each key's AUC equals auc_report on that key's slice
        (a_only, *_), = rows(auc_report(d.filter("g = 'a'"), "s", "y"))
        assert out["a"] == a_only

    def test_single_class_key_null(self, spark):
        from polars_net_spark.operators.mleval import group_auc

        d = spark.createDataFrame(
            [("a", 1.0, 1), ("a", 2.0, 1), ("b", 1.0, 1), ("b", 2.0, 0)],
            "g string, s double, y int",
        )
        out = {r[0]: r[1] for r in rows(group_auc(d, "s", "y", by="g"))}
        # key a has one class -> null; key b's positive has the LOWER score
        assert out["a"] is None and out["b"] == 0.0


class TestAveragePrecision:
    def test_perfect_ranking(self, spark):
        from polars_net_spark.operators.mleval import average_precision

        d = spark.createDataFrame(
            [(float(i), 1 if i >= 7 else 0, i) for i in range(10)],
            "s double, y int, id long",
        )
        (ap, npos, n), = rows(average_precision(d, "s", "y", "id"))
        assert ap == 1.0 and npos == 3

    def test_textbook_example(self, spark):
        from polars_net_spark.operators.mleval import average_precision

        # ranking (desc score): pos, neg, pos, neg -> AP = (1/1 + 2/3)/2
        d = spark.createDataFrame(
            [(4.0, 1, 0), (3.0, 0, 1), (2.0, 1, 2), (1.0, 0, 3)],
            "s double, y int, id long",
        )
        (ap, npos, n), = rows(average_precision(d, "s", "y", "id"))
        assert abs(ap - (1.0 + 2.0 / 3.0) / 2.0) < 1e-6

    def test_partition_invariant(self, spark):
        from polars_net_spark.operators.mleval import average_precision

        d = spark.createDataFrame(
            [(float((i * 13) % 97), i % 3 == 0, i) for i in range(500)],
            "s double, y boolean, id long",
        )
        a = rows(average_precision(d, "s", "y", "id"))
        b = rows(average_precision(d.repartition(11), "s", "y", "id"))
        assert a == b


class TestHeapsLaw:
    def test_growing_vocab_beta_near_one_half(self, spark):
        # synthetic corpus with genuinely growing vocabulary: doc i
        # introduces words drawn from a growing id pool
        import numpy as np

        from polars_net_spark.llm.text import heaps_law

        rng = np.random.RandomState(4)
        docs = []
        for i in range(400):
            pool = int(10 * (i + 1) ** 0.6) + 5
            words = [f"w{rng.randint(0, pool)}" for _ in range(30)]
            docs.append((i, " ".join(words)))
        d = spark.createDataFrame(docs, "doc_id long, text string").repartition(6)
        (npts, k, beta, r2, vf, tf), = rows(heaps_law(d, "text", "doc_id", 8))
        assert npts == 8 and 0.2 < beta < 0.9 and r2 > 0.9
        assert vf > 100 and tf == 400 * 30

    def test_validation(self, spark):
        import pytest as _pt

        from polars_net_spark.llm.text import heaps_law

        d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with _pt.raises(ValueError):
            heaps_law(d, "text", "doc_id", n_points=1)


class TestInterarrival:
    def test_metronome_burstiness_minus_one(self, spark):
        import datetime as dt

        from polars_net_spark.operators.analytics import interarrival_report

        base = dt.datetime(2024, 1, 1)
        d = spark.createDataFrame(
            [("k", base + dt.timedelta(seconds=10 * i)) for i in range(50)],
            "g string, ts timestamp",
        ).repartition(5)
        (r,) = rows(interarrival_report(d, "ts", by="g"))
        # r = (g, n_events, n_gaps, mean, std, cv, burstiness, min, max)
        assert r[3] == 10.0 and r[4] == 0.0  # mean 10s, std 0
        assert r[6] == -1.0  # perfect metronome
        # global (halo) path identical minus the key
        (g,) = rows(interarrival_report(d, "ts"))
        assert tuple(r[1:]) == g

    def test_burst_pattern_positive(self, spark):
        import datetime as dt

        from polars_net_spark.operators.analytics import interarrival_report

        base = dt.datetime(2024, 1, 1)
        ts, cur = [], 0.0
        for burst in range(20):
            for j in range(10):
                cur += 0.1
                ts.append(cur)
            cur += 600.0
            ts.append(cur)
        d = spark.createDataFrame(
            [(base + dt.timedelta(seconds=s),) for s in ts], "ts timestamp"
        ).repartition(4)
        (r,) = rows(interarrival_report(d, "ts"))
        assert r[5] > 0.5  # strongly bursty


class TestKrippendorff:
    def test_perfect_agreement(self, spark):
        from polars_net_spark.operators.regression import krippendorff_alpha

        d = spark.createDataFrame(
            [(u, "yes" if u % 2 else "no") for u in range(20) for _ in range(3)],
            "u long, v string",
        )
        (alpha, do, de, n, nu, k), = rows(krippendorff_alpha(d, "u", "v"))
        assert alpha == 1.0 and do == 0.0 and n == 60 and nu == 20 and k == 2

    def test_wikipedia_example(self, spark):
        # Krippendorff's canonical nominal example (2 coders, some missing):
        # units with values: (1,1) (2,2) (3,3) (3,3) (2,2) (1,2) (4,4) (1,1)
        # (2,2) (5,5) (1,1) (3,3), plus single-rating units that must drop
        pairs = [
            (1, 1, 1), (2, 2, 2), (3, 3, 3), (4, 3, 3), (5, 2, 2), (6, 1, 2),
            (7, 4, 4), (8, 1, 1), (9, 2, 2), (10, 5, 5), (11, 1, 1), (12, 3, 3),
        ]
        data = [(u, a) for u, a, b in pairs] + [(u, b) for u, a, b in pairs]
        data += [(100, 9), (101, 7)]  # pairable=no, must be ignored
        from polars_net_spark.operators.regression import krippendorff_alpha

        spark_df = spark.createDataFrame(data, "u long, v int")
        (alpha, do, de, n, nu, k), = rows(krippendorff_alpha(spark_df, "u", "v"))
        assert n == 24 and nu == 12
        # literature value for this table: alpha ~ 0.886 (nominal)
        assert abs(alpha - 0.886) < 0.01

    def test_validation(self, spark):
        import pytest as _pt

        from polars_net_spark.operators.regression import krippendorff_alpha

        d = spark.createDataFrame([(1, "a")], "u long, v string")
        with _pt.raises(ValueError):
            krippendorff_alpha(d, "u", "v")


class TestWasserstein:
    def test_shifted_uniform(self, spark):
        # B = A + 2 pointwise: W1 exactly 2
        d = spark.createDataFrame(
            [("a", float(v)) for v in range(100)]
            + [("b", float(v) + 2.0) for v in range(100)],
            "g string, v double",
        ).repartition(6)
        from polars_net_spark.operators.analytics import wasserstein_1d

        (w1, na, nb), = rows(wasserstein_1d(d, "v", "g", "a", "b"))
        assert abs(w1 - 2.0) < 1e-9 and na == 100 and nb == 100

    def test_identical_is_zero(self, spark):
        from polars_net_spark.operators.analytics import wasserstein_1d

        d = spark.createDataFrame(
            [(g, float(v % 13)) for g in ("a", "b") for v in range(60)],
            "g string, v double",
        )
        (w1, *_), = rows(wasserstein_1d(d, "v", "g", "a", "b"))
        assert w1 == 0.0

    def test_matches_scipy_formula(self, spark):
        import numpy as np

        from polars_net_spark.operators.analytics import wasserstein_1d

        rng = np.random.RandomState(2)
        a = rng.exponential(3.0, 400)
        b = rng.exponential(5.0, 300)
        d = spark.createDataFrame(
            [("a", float(v)) for v in a] + [("b", float(v)) for v in b],
            "g string, v double",
        ).repartition(9)
        (w1, *_), = rows(wasserstein_1d(d, "v", "g", "a", "b"))
        # reference: explicit merged-support integral
        vs = np.sort(np.unique(np.concatenate([a, b])))
        fa = np.searchsorted(np.sort(a), vs, side="right") / len(a)
        fb = np.searchsorted(np.sort(b), vs, side="right") / len(b)
        ref = float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(vs)))
        assert abs(w1 - ref) < 1e-6


class TestDiversity:
    def test_uniform_and_singletons(self, spark):
        from polars_net_spark.operators.analytics import diversity_report

        d = spark.createDataFrame(
            [(f"v{i % 4}",) for i in range(40)] + [(None,)], "c string"
        )
        (n, n_null, k, h, hn, simp, effk, f1), = rows(diversity_report(d, "c"))
        assert n == 40 and n_null == 1 and k == 4
        assert abs(h - math.log(4)) < 1e-6 and hn == 1.0
        assert simp == 0.25 and abs(effk - 4.0) < 1e-4 and f1 == 0.0

    def test_singleton_share(self, spark):
        from polars_net_spark.operators.analytics import diversity_report

        d = spark.createDataFrame([("a",), ("a",), ("b",), ("c",)], "c string")
        (n, _, k, *_, f1), = rows(diversity_report(d, "c"))
        assert n == 4 and k == 3 and f1 == 0.5  # b and c are singletons


class TestNelsonAalen:
    def test_cum_hazard_monotone_and_matches_hand(self, spark):
        from polars_net_spark.operators.analytics import nelson_aalen

        # 4 subjects: events at t=1,2, censored at 2,3
        d = spark.createDataFrame(
            [(1.0, 1), (2.0, 1), (2.0, 0), (3.0, 0)], "t double, e int"
        )
        out = sorted(rows(nelson_aalen(d, "t", "e")))
        # t=1: n=4 d=1 -> H=0.25 ; t=2: n=3 d=1 -> H=0.25+1/3 ; t=3: d=0
        assert out[0][3] == 0.25
        assert abs(out[1][3] - (0.25 + 1.0 / 3.0)) < 1e-6
        assert out[2][3] == out[1][3]

    def test_keyed_matches_global(self, spark):
        from polars_net_spark.operators.analytics import nelson_aalen

        data = [("k", float((i * 7) % 30 + 1), 1 if i % 3 else 0) for i in range(150)]
        d = spark.createDataFrame(data, "g string, t double, e int").repartition(5)
        keyed = sorted(r[1:] for r in rows(nelson_aalen(d, "t", "e", by="g")))
        glob = sorted(rows(nelson_aalen(d, "t", "e")))
        assert keyed == glob


class TestNgramCoverage:
    def test_full_and_partial(self, spark):
        from polars_net_spark.llm.text import ngram_coverage

        tr = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
        te = spark.createDataFrame(
            [(1, "a b c"), (2, "x y")], "doc_id long, text string"
        )
        (types, cov, tc, toks, tokc), = rows(ngram_coverage(tr, te, n=2))
        # test bigrams: {a b, b c, x y}; train has a b, b c
        assert types == 3 and cov == 2 and abs(tc - 2 / 3) < 1e-6
        assert toks == 3 and abs(tokc - 2 / 3) < 1e-6

    def test_unigram_mode(self, spark):
        from polars_net_spark.llm.text import ngram_coverage

        tr = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        te = spark.createDataFrame([(1, "a a z")], "doc_id long, text string")
        (types, cov, tc, toks, tokc), = rows(ngram_coverage(tr, te, n=1))
        assert types == 2 and cov == 1 and toks == 3
        assert abs(tokc - 2 / 3) < 1e-6  # two 'a' tokens covered of three


class TestDupRate:
    def test_detects_injected_dups(self, spark):
        from polars_net_spark.operators.analytics import dup_rate_by_key

        rows_in = [("s1", f"unique text {i}") for i in range(8)] + [
            ("s1", "dup text"), ("s1", "dup  TEXT "),  # normalization collapses
            ("s2", "clean a"), ("s2", "clean b"),
        ]
        d = spark.createDataFrame(rows_in, "source string, text string")
        out = {r[0]: r for r in rows(dup_rate_by_key(d, "text", "source"))}
        assert out["s1"][1] == 10 and out["s1"][2] == 9
        assert out["s1"][3] == 2  # the two dup rows
        assert out["s2"][3] == 0 and out["s2"][5] == 0.0


class TestR9AdviceFixes:
    def test_krippendorff_degenerate_all_identical_is_one(self, spark):
        # every pairable rating is the SAME value: d_e == d_o == 0 ->
        # perfect agreement by convention (1.0, not null)
        from polars_net_spark.operators.regression import krippendorff_alpha

        d = spark.createDataFrame(
            [(u, "yes") for u in range(10) for _ in range(3)], "u long, v string"
        )
        (alpha, do, de, n, nu, k), = rows(krippendorff_alpha(d, "u", "v"))
        assert alpha == 1.0 and do == 0.0 and de == 0.0 and k == 1

    def test_weighted_quantiles_top_q_is_max(self, spark):
        # many float weights across many partitions: q=1.0 must return the
        # global max even if the bucket cumsum lands ULPs below W
        import random

        from polars_net_spark.operators.analytics import weighted_quantiles

        rng = random.Random(7)
        data = [(float(i), rng.random() * 0.1 + 1e-9) for i in range(5000)]
        d = spark.createDataFrame(data, "v double, w double").repartition(13)
        out = {r[0]: r[1] for r in rows(weighted_quantiles(d, "v", "w", (0.5, 1.0)))}
        assert out[1.0] == 4999.0

    def test_heaps_law_string_id_raises(self, spark):
        import pytest as _pt

        from polars_net_spark.llm.text import heaps_law

        d = spark.createDataFrame(
            [("a", "x y"), ("b", "y z")], "doc_id string, text string"
        )
        with _pt.raises(TypeError, match="numerically"):
            heaps_law(d, "text", "doc_id")

    def test_heaps_law_timestamp_id(self, spark):
        import datetime as dt

        from polars_net_spark.llm.text import heaps_law

        base = dt.datetime(2024, 1, 1)
        docs = [
            (base + dt.timedelta(hours=i), f"w{i} w{i % 3} common")
            for i in range(40)
        ]
        d = spark.createDataFrame(docs, "doc_id timestamp, text string")
        (npts, k, beta, r2, vf, tf), = rows(heaps_law(d, "text", "doc_id", 4))
        # vocab = w0..w39 plus 'common' (w{i%3} repeats w0/w1/w2)
        assert npts == 4 and vf == 41 and tf == 120
