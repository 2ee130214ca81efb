"""Tests for validate_frame, target encoding, feature hashing, and PMI
collocations (q231-q234 operators)."""

import math

import pytest

from polars_net_spark.llm.retrieval import pmi_collocations
from polars_net_spark.llm.vocab import feature_hash_frame
from polars_net_spark.operators.analytics import target_encode, with_target_encoded
from polars_net_spark.operators.validate import validate_frame


def rows(lf):
    return lf.collect().rows()


class TestValidateFrame:
    def test_all_rule_kinds(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 5.0), (2, "b", -1.0), (2, "c", None), (4, None, 120.0)],
            "id long, s string, v double",
        )
        out = {
            (r[0], r[1]): r
            for r in rows(
                validate_frame(
                    df,
                    [
                        {"col": "id", "check": "unique"},
                        {"col": "s", "check": "not_null"},
                        {"col": "v", "check": "between", "lo": 0, "hi": 100},
                        {"col": "s", "check": "in_set", "values": ["a", "b"],
                         "max_violation_rate": 0.5},
                        {"col": "s", "check": "regex", "pattern": "^[ab]$"},
                    ],
                )
            )
        }
        assert out[("unique", "id")][3] == 1  # one duplicate beyond first
        assert out[("not_null", "s")][3] == 1
        # -1 below lo, 120 above hi; the NULL v does not violate the range
        assert out[("between 0 100", "v")][3] == 2
        assert out[("in_set", "s")][3] == 1 and out[("in_set", "s")][5] is True
        assert out[("regex", "s")][5] is False
        assert all(r[2] == 4 for r in out.values())

    def test_clean_frame_passes(self, spark):
        df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, v double")
        out = rows(
            validate_frame(
                df,
                [
                    {"col": "id", "check": "unique"},
                    {"col": "v", "check": "min", "value": 0},
                ],
            )
        )
        assert all(r[3] == 0 and r[5] is True for r in out)

    def test_unknown_check_raises(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="unknown check"):
            validate_frame(df, [{"col": "id", "check": "nope"}]).collect()

    def test_empty_rules_raise(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError, match="non-empty"):
            validate_frame(df, [])


class TestTargetEncode:
    def test_shrinkage_math(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 0.0), ("a", 1.0), ("b", 1.0), (None, 0.0)],
            "c string, y double",
        )
        out = {r[0]: r for r in rows(target_encode(df, "c", "y", smoothing=2.0))}
        # prior = 0.6; enc(a) = (2 + 2*0.6)/(3+2); enc(b) = (1+1.2)/3
        assert out["a"][1:] == (3, pytest.approx(0.666667), pytest.approx(0.64))
        assert out["b"][3] == pytest.approx(0.733333)
        assert out[None][3] == pytest.approx(0.4)  # null level encodes too

    def test_zero_smoothing_is_plain_mean(self, spark):
        df = spark.createDataFrame([("a", 2.0), ("a", 4.0)], "c string, y double")
        out = rows(target_encode(df, "c", "y", smoothing=0.0))
        assert out[0][2] == out[0][3] == pytest.approx(3.0)

    def test_row_level_join_back(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 0.0), ("b", 1.0)], "c string, y double"
        )
        out = rows(with_target_encoded(df, "c", "y", smoothing=1.0))
        enc = {r[0]: r[2] for r in out}
        # prior = 2/3; a: (1 + 2/3)/3, b: (1 + 2/3)/2
        assert enc["a"] == pytest.approx(5.0 / 9.0, abs=1e-6)
        assert enc["b"] == pytest.approx(5.0 / 6.0, abs=1e-6)
        assert len(out) == 3 and out[0][:2] in {("a", 1.0), ("a", 0.0), ("b", 1.0)}

    def test_negative_smoothing_raises(self, spark):
        df = spark.createDataFrame([("a", 1.0)], "c string, y double")
        with pytest.raises(ValueError):
            target_encode(df, "c", "y", smoothing=-1.0)


class TestFeatureHash:
    def test_deterministic_and_sparse(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a c"), (2, ""), (3, "a a")], "doc_id long, text string"
        )
        out = {r[0]: r for r in rows(feature_hash_frame(df, n_features=8))}
        assert out[2][1] == [] and out[2][2] == []  # empty doc -> empty arrays
        # same token twice accumulates (|value| == 2 for 'a a')
        assert [abs(v) for v in out[3][2]] == [2.0]
        # indices ascending
        assert out[1][1] == sorted(out[1][1])
        again = {r[0]: r for r in rows(feature_hash_frame(df, n_features=8))}
        assert again == out  # rerun-identical

    def test_unsigned_mode_counts(self, spark):
        df = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
        (r,) = rows(feature_hash_frame(df, n_features=16, signed=False))
        assert sorted(r[2], reverse=True) == [2.0, 1.0]

    def test_seed_changes_buckets(self, spark):
        df = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(30)))], "doc_id long, text string"
        )
        a = rows(feature_hash_frame(df, n_features=1024, seed="s1"))[0][1]
        b = rows(feature_hash_frame(df, n_features=1024, seed="s2"))[0][1]
        assert a != b

    def test_bad_n_features_raises(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            feature_hash_frame(df, n_features=0)


class TestPMICollocations:
    def test_perfect_collocation_npmi_is_one(self, spark):
        df = spark.createDataFrame(
            [(i, "x y") for i in range(20)], "doc_id long, text string"
        )
        (r,) = rows(pmi_collocations(df, min_count=2))
        assert r[:3] == ("x", "y", 20)
        # nt = 40 tokens; pmi = ln((20/40) / (0.5 * 0.5)) = ln 2
        assert r[3] == pytest.approx(math.log(2.0), abs=1e-6)
        assert r[4] == pytest.approx(1.0, abs=1e-6)

    def test_min_count_prunes(self, spark):
        df = spark.createDataFrame(
            [(1, "p q"), (2, "p q"), (3, "r s")], "doc_id long, text string"
        )
        out = rows(pmi_collocations(df, min_count=2))
        assert [(r[0], r[1]) for r in out] == [("p", "q")]

    def test_independent_pair_has_low_npmi(self, spark):
        # a and b appear everywhere; the bigram (a,b) occurs at chance level
        docs = [(i, "a c b d a e b f") for i in range(10)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = {(r[0], r[1]): r for r in rows(pmi_collocations(df, min_count=5))}
        # every adjacent pair occurs 10x; none is a strong collocation
        assert all(r[4] < 1.0 for r in out.values())


class TestMarkovTransitions:
    def test_counts_and_normalization(self, spark):
        from polars_net_spark.operators.analytics import markov_transitions

        df = spark.createDataFrame(
            [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b"), (2, 1, "a"), (2, 2, "a")],
            "u long, t long, s string",
        )
        out = {(r[0], r[1]): r for r in rows(markov_transitions(df, "s", "t", by="u"))}
        assert out[("a", "b")][2] == 2 and out[("a", "b")][3] == pytest.approx(2 / 3)
        assert out[("a", "a")][2] == 1
        assert out[("b", "a")][3] == 1.0
        # rows sum to 1 per from_state
        import collections

        sums = collections.defaultdict(float)
        for (f, _), r in out.items():
            sums[f] += r[3]
        assert all(abs(v - 1.0) < 1e-5 for v in sums.values())

    def test_sequence_boundaries_do_not_leak(self, spark):
        from polars_net_spark.operators.analytics import markov_transitions

        # user 1 ends with 'x', user 2 starts with 'y': no x->y transition
        df = spark.createDataFrame(
            [(1, 1, "a"), (1, 2, "x"), (2, 1, "y"), (2, 2, "a")],
            "u long, t long, s string",
        )
        out = rows(markov_transitions(df, "s", "t", by="u"))
        assert ("x", "y") not in {(r[0], r[1]) for r in out}


class TestConformal:
    def test_known_quantile(self, spark):
        from polars_net_spark.llm.evaluation import conformal_threshold

        cal = spark.createDataFrame([(float(i),) for i in range(1, 101)], "s double")
        (r,) = rows(conformal_threshold(cal, "s", alpha=0.1))
        assert r == (100, 91, 91.0)  # ceil(101*0.9) = 91

    def test_alpha_too_small_gives_null(self, spark):
        from polars_net_spark.llm.evaluation import conformal_threshold

        cal = spark.createDataFrame([(1.0,), (2.0,)], "s double")
        (r,) = rows(conformal_threshold(cal, "s", alpha=0.01))
        assert r[2] is None

    def test_coverage_guarantee_on_exchangeable_data(self, spark):
        from polars_net_spark.llm.evaluation import conformal_threshold, conformal_coverage

        # deterministic pseudo-random scores, same distribution both halves
        vals = [((i * 2654435761) % 10007) / 10007.0 for i in range(2000)]
        cal = spark.createDataFrame([(v,) for v in vals[:1000]], "s double")
        tst = spark.createDataFrame([(v,) for v in vals[1000:]], "s double")
        th = conformal_threshold(cal, "s", alpha=0.2)
        (c,) = rows(conformal_coverage(tst, "s", th))
        assert c[2] >= 0.75  # 1 - alpha minus finite-sample slack

    def test_bad_alpha_raises(self, spark):
        from polars_net_spark.llm.evaluation import conformal_threshold

        cal = spark.createDataFrame([(1.0,)], "s double")
        with pytest.raises(ValueError):
            conformal_threshold(cal, "s", alpha=1.5)
