"""k_core (operators/graph.py) — fixpoint peeling."""

import pytest

from polars_net_spark.operators.graph import k_core


def rows(lf):
    return sorted(lf.collect().rows())


def _ref_kcore(edges, k):
    """Literal peeling reference."""
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        bad = {v for v, c in deg.items() if c < k}
        if not bad:
            return sorted(deg.items())
        es = {e for e in es if e[0] not in bad and e[1] not in bad}


class TestKCore:
    def test_triangle_plus_tail(self, spark):
        # triangle {1,2,3} + tail 3-4-5: 2-core = the triangle
        edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
        d = spark.createDataFrame(edges, "src long, dst long")
        got = rows(k_core(d, 2))
        assert got == [(1, 2), (2, 2), (3, 2)]

    def test_cascading_peel(self, spark):
        # chain 1-2-3-4-5: 2-core empty (peel cascades from both ends)
        edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
        d = spark.createDataFrame(edges, "src long, dst long")
        assert rows(k_core(d, 2)) == []

    def test_matches_reference_random(self, spark):
        import numpy as np

        rng = np.random.RandomState(3)
        edges = [
            (int(rng.randint(0, 60)), int(rng.randint(0, 60))) for _ in range(400)
        ]
        d = spark.createDataFrame(edges, "src long, dst long").repartition(7)
        for k in (2, 3, 5):
            assert rows(k_core(d, k)) == _ref_kcore(edges, k)

    def test_dups_reversals_loops_collapse(self, spark):
        edges = [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (1, 3)]
        d = spark.createDataFrame(edges, "src long, dst long")
        assert rows(k_core(d, 2)) == [(1, 2), (2, 2), (3, 2)]

    def test_k1_keeps_everything_connected(self, spark):
        d = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
        assert rows(k_core(d, 1)) == [(1, 1), (2, 1), (3, 1), (4, 1)]

    def test_max_rounds_raises(self, spark):
        d = spark.createDataFrame(
            [(i, i + 1) for i in range(10)], "src long, dst long"
        )
        with pytest.raises(RuntimeError, match="max_rounds"):
            k_core(d, 2, max_rounds=2)

    def test_bad_k(self, spark):
        d = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError):
            k_core(d, 0)
