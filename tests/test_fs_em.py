"""fellegi_sunter_em: EM estimation of record-linkage (m, u) parameters
(Winkler 1988) over candidate-pair agreement vectors — brute-force
per-pair EM cross-check + planted-mixture recovery."""

import math
import random

import pytest

from polars_net_spark.operators.joins_ext import fellegi_sunter_em


def _brute_em(pairs, nf, iters, p0=0.1, m0=0.9, u0=0.1, eps=1e-6):
    """Independent reference: EM over the RAW pair list (no pattern
    collapse), same init/clamp conventions."""
    lo, hi = eps, 1.0 - eps
    cl = lambda x: min(max(x, lo), hi)  # noqa: E731
    p, m, u = p0, [m0] * nf, [u0] * nf
    for _ in range(iters):
        n = sw = 0.0
        am, cm = [0.0] * nf, [0.0] * nf
        au, cu = [0.0] * nf, [0.0] * nf
        for gs in pairs:
            pm = pu = 1.0
            for i, g in enumerate(gs):
                if g is None:
                    continue
                pm *= m[i] if g else 1.0 - m[i]
                pu *= u[i] if g else 1.0 - u[i]
            w = p * pm / (p * pm + (1.0 - p) * pu)
            n += 1.0
            sw += w
            for i, g in enumerate(gs):
                if g is None:
                    continue
                cm[i] += w
                cu[i] += 1.0 - w
                if g:
                    am[i] += w
                    au[i] += 1.0 - w
        p = cl(sw / n)
        m = [cl(am[i] / cm[i]) for i in range(nf)]
        u = [cl(au[i] / cu[i]) for i in range(nf)]
    return p, m, u


def _mk(spark, pairs):
    return spark.createDataFrame(
        [tuple(p) for p in pairs], "g1 boolean, g2 boolean, g3 boolean"
    )


class TestFellegiSunterEM:
    def test_matches_per_pair_bruteforce(self, spark):
        rng = random.Random(11)
        pairs = []
        for _ in range(400):
            is_match = rng.random() < 0.2
            gs = []
            for mf, uf in ((0.95, 0.3), (0.85, 0.1), (0.7, 0.4)):
                if rng.random() < 0.05:
                    gs.append(None)  # missing field
                else:
                    gs.append(rng.random() < (mf if is_match else uf))
            pairs.append(gs)
        out = {
            r["field"]: r
            for r in fellegi_sunter_em(
                _mk(spark, pairs), ["g1", "g2", "g3"], iters=4, round_to=9
            ).spark.collect()
        }
        p_ref, m_ref, u_ref = _brute_em(pairs, 3, iters=4)
        for i, f in enumerate(["g1", "g2", "g3"]):
            assert out[f]["m"] == pytest.approx(m_ref[i], abs=1e-9)
            assert out[f]["u"] == pytest.approx(u_ref[i], abs=1e-9)
            assert out[f]["lambda"] == pytest.approx(p_ref, abs=1e-9)
            assert out[f]["w_agree"] == pytest.approx(
                math.log2(m_ref[i] / u_ref[i]), abs=1e-6
            )
            assert out[f]["n_pairs"] == 400 and out[f]["iters"] == 4

    def test_recovers_planted_mixture(self, spark):
        # >= 3 fields: with 2 binary fields the mixture has more free
        # parameters than pattern degrees of freedom (the classic FS
        # identifiability requirement), so EM cannot pin p down
        rng = random.Random(3)
        true = {"p": 0.25, "m": (0.92, 0.88, 0.8), "u": (0.15, 0.05, 0.3)}
        pairs = []
        for _ in range(8000):
            is_match = rng.random() < true["p"]
            pairs.append(
                [
                    rng.random() < (true["m"][i] if is_match else true["u"][i])
                    for i in range(3)
                ]
            )
        out = {
            r["field"]: r
            for r in fellegi_sunter_em(
                _mk(spark, pairs), ["g1", "g2", "g3"], iters=60
            ).spark.collect()
        }
        assert out["g1"]["lambda"] == pytest.approx(true["p"], abs=0.04)
        for i, f in enumerate(["g1", "g2", "g3"]):
            assert out[f]["m"] == pytest.approx(true["m"][i], abs=0.06)
            assert out[f]["u"] == pytest.approx(true["u"][i], abs=0.06)
        # estimated weights discriminate the right way
        assert out["g1"]["w_agree"] > 0 > out["g1"]["w_disagree"]

    def test_clamp_on_perfectly_separated(self, spark):
        # every pair agrees on g1 iff it is a match -> m would hit 1, u 0;
        # the Winkler clamp keeps both inside (0, 1) and the weights finite
        pairs = [[True, True] for _ in range(50)] + [
            [False, False] for _ in range(150)
        ]
        d = spark.createDataFrame(
            [tuple(p) for p in pairs], "g1 boolean, g2 boolean"
        )
        out = {
            r["field"]: r
            for r in fellegi_sunter_em(d, ["g1", "g2"], iters=30).spark.collect()
        }
        assert 0.0 < out["g1"]["u"] < out["g1"]["m"] < 1.0
        assert math.isfinite(out["g1"]["w_agree"])

    def test_partitioning_invariant(self, spark):
        rng = random.Random(7)
        pairs = [
            [rng.random() < 0.5, rng.random() < 0.3, rng.random() < 0.7]
            for _ in range(500)
        ]
        d = _mk(spark, pairs)
        a = fellegi_sunter_em(d, ["g1", "g2", "g3"], iters=5).spark.collect()
        b = fellegi_sunter_em(
            d.repartition(13), ["g1", "g2", "g3"], iters=5
        ).spark.collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_validations(self, spark):
        d = _mk(spark, [[True, True, False]])
        with pytest.raises(ValueError, match="at least one"):
            fellegi_sunter_em(d, [])
        with pytest.raises(ValueError, match="init_u < init_m"):
            fellegi_sunter_em(d, ["g1"], init_m=0.2, init_u=0.5)
        with pytest.raises(ValueError, match="iters"):
            fellegi_sunter_em(d, ["g1"], iters=0)
        with pytest.raises(ValueError, match="no candidate pairs"):
            fellegi_sunter_em(d.filter("g2 IS NULL"), ["g1"])
        # a field that is null on every pair cannot be estimated
        d2 = spark.createDataFrame(
            [(True, None), (False, None)], "g1 boolean, g2 boolean"
        )
        with pytest.raises(ValueError, match="no non-null"):
            fellegi_sunter_em(d2, ["g1", "g2"], iters=2)
