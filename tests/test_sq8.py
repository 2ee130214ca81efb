"""SQ8 scalar quantization: encode/decode, top-k, recall gate."""

import polars_net_spark as pl
from polars_net_spark.llm.similarity import (
    cosine_topk,
    sq8_quantize,
    sq8_recall_frame,
    sq8_topk,
)


def vecs(spark, n=40, dim=8):
    # deterministic clustered vectors: two lobes + small per-id wiggle
    rows = []
    for i in range(n):
        base = 1.0 if i % 2 == 0 else -1.0
        v = [base * (1.0 + 0.01 * ((i * 7 + j * 3) % 5)) for j in range(dim)]
        v[i % dim] += 0.25
        rows.append((i, v))
    return pl.from_records(rows, ["vec_id", "embedding"]).lazy()


def test_sq8_quantize_codes_and_bounds(spark):
    out = sq8_quantize(vecs(spark)).collect()
    rows = out.rows()
    assert len(rows) == 40
    for _, codes, dq in rows:
        assert all(0 <= c <= 255 for c in codes)
        assert len(codes) == len(dq) == 8
    # dequantization error is bounded by scale/2 = (max-min)/510 per dim
    raw = {r[0]: r[1] for r in vecs(spark).collect().rows()}
    spread = 2 * (1.0 + 0.01 * 4) + 0.25  # conservative per-dim range bound
    tol = spread / 510 + 1e-9
    for vid, _, dq in rows:
        for a, b in zip(raw[vid], dq):
            assert abs(a - b) <= tol


def test_sq8_flat_dimension_is_exact(spark):
    d = pl.from_records(
        [(0, [1.0, 5.0]), (1, [1.0, 7.0]), (2, [1.0, 6.0])], ["vec_id", "embedding"]
    ).lazy()
    out = {r[0]: r[2] for r in sq8_quantize(d).collect().rows()}
    for vid in (0, 1, 2):
        assert out[vid][0] == 1.0  # flat dim dequantizes exactly


def test_sq8_topk_close_to_exact(spark):
    d = vecs(spark)
    q = pl.from_records(
        [r for r in vecs(spark).collect().rows()[:4]], ["vec_id", "embedding"]
    ).lazy()
    approx = sq8_topk(d, q, k=5).collect().rows()
    assert len(approx) == 20
    exact = cosine_topk(d, q, k=5, method="expr").collect().rows()
    a_sets = {}
    e_sets = {}
    for qid, cid, _, _ in approx:
        a_sets.setdefault(qid, set()).add(cid)
    for qid, cid, _, _ in exact:
        e_sets.setdefault(qid, set()).add(cid)
    for qid in a_sets:
        inter = len(a_sets[qid] & e_sets[qid])
        assert inter >= 4  # 8-bit codes: at most one borderline swap


def test_sq8_recall_frame(spark):
    d = vecs(spark)
    q = pl.from_records(
        [r for r in vecs(spark).collect().rows()[:4]], ["vec_id", "embedding"]
    ).lazy()
    out = sq8_recall_frame(d, q, k=5, min_recall=0.6).collect()
    assert out.height == 4
    for _, recall, ok in out.rows():
        assert 0.0 <= recall <= 1.0
        assert ok == (1 if recall >= 0.6 else 0)
        assert recall >= 0.6
