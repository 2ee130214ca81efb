"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the (small) query
  set against the corpus; one pass, no shuffle of the corpus.  The baseline
  and the verifier for approximate methods.
- :func:`lsh_bucket_topk` — random-hyperplane LSH: corpus and queries are
  bucketed by sign patterns; only same-bucket pairs are scored.  The scale
  path: the corpus is hash-partitioned by bucket, queries probe their bucket
  (+ optional multi-probe), so each query touches a fraction of the corpus.

Dot products are F.zip_with + F.aggregate — JVM codegen, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame as SparkDF, Window
from pyspark.sql import functions as F

from ..frame import LazyFrame

__all__ = ["cosine_topk", "lsh_bucket_topk", "cosine_sim"]


def _sdf(frame) -> SparkDF:
    return frame._sdf if isinstance(frame, LazyFrame) else frame


def cosine_sim(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x.cast("double") * x.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, x: s + x.cast("double") * x.cast("double")))
    return dot / (na * nb)


def cosine_topk(
    corpus: "LazyFrame | SparkDF",
    queries: "LazyFrame | SparkDF",
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str | None = None,
    round_to: int = 6,
) -> LazyFrame:
    """Exact top-k neighbours for every query vector (excluding self-matches
    when ids collide).  Query side is broadcast: corpus is scanned once and
    never shuffled; per-query ranking is a window over (query_id)."""
    c = _sdf(corpus).select(
        F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("cv")
    )
    qid = query_id_col or id_col
    q = _sdf(queries).select(F.col(qid).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id")).withColumn(
        "cosine", F.round(cosine_sim(F.col("qv"), F.col("cv")), round_to)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
    return LazyFrame(out)


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (no RNG state: a simple
    LCG keyed on (seed, i) so plans are reproducible across runs/executors)."""
    vals = []
    state = (seed * 2654435761 + 0x9E3779B9) & 0xFFFFFFFF
    for _ in range(dim):
        state = (1103515245 * state + 12345) & 0x7FFFFFFF
        vals.append((state / 0x7FFFFFFF) * 2.0 - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    bits = []
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in p])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out


def lsh_bucket_topk(
    corpus: "LazyFrame | SparkDF",
    queries: "LazyFrame | SparkDF",
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str | None = None,
    num_planes: int = 8,
    num_tables: int = 4,
    dim: int | None = None,
    round_to: int = 6,
) -> LazyFrame:
    """Approximate top-k: random-hyperplane buckets, multi-table.

    Each of ``num_tables`` tables hashes vectors by the sign pattern against
    ``num_planes`` hyperplanes (2^planes buckets/table).  A query only scores
    corpus vectors sharing a bucket in ≥1 table.  Recall rises with tables;
    cost per query falls ~2^planes-fold vs brute force.
    """
    c_sdf, q_sdf = _sdf(corpus), _sdf(queries)
    if dim is None:
        dim = len(c_sdf.select(vec_col).first()[0])
    qid = query_id_col or id_col

    tables = []
    for t in range(num_tables):
        planes = [_hyperplane(dim, seed=t * 1000 + i) for i in range(num_planes)]
        tables.append((t, planes))

    def buckets(sdf: SparkDF, idc: str, vecc: str, out_id: str, out_vec: str) -> SparkDF:
        entries = F.array(
            *[
                F.struct(F.lit(t).alias("table"), _bucket_expr(F.col(vecc), planes).alias("bucket"))
                for t, planes in tables
            ]
        )
        return sdf.select(
            F.col(idc).alias(out_id), F.col(vecc).alias(out_vec), F.explode(entries).alias("tb")
        ).select(out_id, out_vec, F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))

    cb = buckets(c_sdf, id_col, vec_col, "corpus_id", "cv")
    qb = buckets(q_sdf, qid, vec_col, "query_id", "qv")
    cand = (
        cb.join(qb, ["table", "bucket"])
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "qv", "corpus_id", "cv")
        .dropDuplicates(["query_id", "corpus_id"])
    )
    scored = cand.withColumn("cosine", F.round(cosine_sim(F.col("qv"), F.col("cv")), round_to))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id").asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )
    return LazyFrame(out)
