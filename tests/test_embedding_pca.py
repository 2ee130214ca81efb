"""embedding_covariance / embedding_pca (llm/similarity.py)."""

import numpy as np
import pytest

from polars_net_spark.llm.similarity import embedding_covariance, embedding_pca


def _frame(spark, x, parts=5):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    ).repartition(parts)


class TestCovariance:
    def test_matches_numpy(self, spark):
        rng = np.random.RandomState(9)
        x = rng.randn(120, 6) * [1, 2, 3, 1, 1, 0.5]
        d = _frame(spark, x)
        got = {(r["i"], r["j"]): r["cov"] for r in
               embedding_covariance(d, round_to=9).spark.collect()}
        ref = np.cov(x, rowvar=False, bias=True)
        assert len(got) == 6 * 7 // 2
        for i in range(6):
            for j in range(i, 6):
                assert abs(got[(i, j)] - ref[i, j]) < 1e-6, (i, j)

    def test_null_vectors_drop(self, spark):
        d = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, None), (3, [3.0, 4.0])],
            "vec_id long, embedding array<double>",
        )
        got = {(r["i"], r["j"]): r["cov"] for r in
               embedding_covariance(d).spark.collect()}
        assert abs(got[(0, 0)] - 1.0) < 1e-9  # var of {1,3} pop = 1
        assert abs(got[(0, 1)] - 1.0) < 1e-9

    def test_empty_raises(self, spark):
        d = spark.createDataFrame([], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError):
            embedding_covariance(d)


class TestPca:
    def test_recovers_dominant_axis(self, spark):
        rng = np.random.RandomState(3)
        # variance overwhelmingly along a known direction
        u = np.array([3.0, 1.0, 0.0, 0.0]) / np.sqrt(10)
        x = np.outer(rng.randn(200) * 10, u) + rng.randn(200, 4) * 0.1
        d = _frame(spark, x)
        out, ratios = embedding_pca(d, k=2)
        assert ratios[0] > 0.98
        rows = out.spark.select("vec_id", "pca").collect()
        got = np.array([r["pca"] for r in sorted(rows, key=lambda r: r["vec_id"])])
        # component 1 spans u: projections match +/- numpy's to rounding
        centered = x - x.mean(axis=0)
        ref = centered @ u
        # sign convention: largest-|entry| of the eigenvector positive -> u itself
        # operator projects the RAW (uncentered) vectors; shift is a constant
        shift = got[:, 0].mean() - ref.mean()
        assert np.abs((got[:, 0] - shift) - ref).max() < 0.2

    def test_matches_numpy_eig_exactly(self, spark):
        rng = np.random.RandomState(5)
        x = rng.randn(150, 5)
        d = _frame(spark, x)
        out, ratios = embedding_pca(d, k=5, round_to=6)
        cov = np.cov(x, rowvar=False, bias=True)
        evals, evecs = np.linalg.eigh(np.round(cov, 12))
        order = np.argsort(evals)[::-1]
        evals_s = evals[order]
        total = evals.clip(min=0).sum()
        for a, b in zip(ratios, evals_s / total):
            assert abs(a - b) < 1e-4
        # projection spot check on one vector, sign-fixed basis
        basis = evecs[:, order]
        for c in range(5):
            j = int(np.abs(basis[:, c]).argmax())
            if basis[j, c] < 0:
                basis[:, c] = -basis[:, c]
        rows = {r["vec_id"]: r["pca"] for r in out.spark.collect()}
        ref0 = x[0] @ basis
        assert np.abs(np.array(rows[0]) - ref0).max() < 1e-4

    def test_k_too_big(self, spark):
        d = _frame(spark, np.eye(3))
        with pytest.raises(ValueError):
            embedding_pca(d, k=10)
