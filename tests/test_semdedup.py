"""SemDeDup (cluster-scoped embedding dedup) — llm/similarity.py semdedup."""

import pytest
from pyspark.sql import functions as F

import polars_net_spark as pl
from polars_net_spark.llm import semdedup


@pytest.fixture(scope="module")
def vecs(spark):
    # two clusters; ids 1/2 nearly identical, 3 orthogonal-ish, 4 alone
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [0.999, 0.01, 0.0, 0.0], 0),
        (3, [0.0, 1.0, 0.0, 0.0], 0),
        (4, [0.0, 0.0, 1.0, 0.0], 1),
    ]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    return pl.LazyFrame(sdf)


def test_label_clusters(vecs):
    out = {
        r["vec_id"]: r
        for r in semdedup(vecs, threshold=0.95, cluster_col="label").spark.collect()
    }
    assert out[1]["is_dup"] is False and out[1]["max_cos_prev"] is None
    assert out[2]["is_dup"] is True and out[2]["max_cos_prev"] > 0.99
    assert out[3]["is_dup"] is False  # cos(1,3)=0 < threshold
    assert out[4]["is_dup"] is False and out[4]["cluster"] == 1


def test_cluster_scoping(spark):
    # identical vectors in DIFFERENT clusters are never compared
    rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 1)]
    sdf = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = semdedup(pl.LazyFrame(sdf), threshold=0.9, cluster_col="label").spark.collect()
    assert all(r["is_dup"] is False for r in out)


def test_auto_hyperplane_path(vecs):
    # auto path: identical-direction vectors always share a sign bucket,
    # so the near-identical pair is still caught
    out = {r["vec_id"]: r for r in semdedup(vecs, threshold=0.95).spark.collect()}
    assert out[2]["is_dup"] is True
    assert out[1]["is_dup"] is False
    assert out[1]["cluster"] == out[2]["cluster"]


def test_dim_skips_probe(vecs):
    out = semdedup(vecs, threshold=0.95, dim=4).spark
    assert out.count() == 4


def test_no_cartesian_plan(vecs):
    txt = (
        semdedup(vecs, threshold=0.9, cluster_col="label")
        .spark._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in txt and "BroadcastNestedLoopJoin" not in txt


class TestEmbeddingUtils:
    def test_normalize(self, spark):
        from polars_net_spark.llm import normalize_embeddings

        sdf = spark.createDataFrame(
            [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
        )
        out = {r["vec_id"]: r["embedding"] for r in
               normalize_embeddings(pl.LazyFrame(sdf)).spark.collect()}
        assert out[1] == [0.6, 0.8]
        assert out[2] is None  # zero-norm -> null

    def test_truncate_renormalize(self, spark):
        from polars_net_spark.llm import truncate_embeddings

        sdf = spark.createDataFrame(
            [(1, [3.0, 4.0, 100.0])], "vec_id long, embedding array<double>"
        )
        out = truncate_embeddings(pl.LazyFrame(sdf), dim=2).spark.collect()[0]["embedding"]
        assert out == [0.6, 0.8]
        raw = truncate_embeddings(pl.LazyFrame(sdf), dim=2, renormalize=False)
        assert raw.spark.collect()[0]["embedding"] == [3.0, 4.0]

    def test_truncate_guard(self, spark):
        import pytest as _pt

        from polars_net_spark.llm import truncate_embeddings

        sdf = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<double>")
        with _pt.raises(ValueError):
            truncate_embeddings(pl.LazyFrame(sdf), dim=0)


class TestJsonPathMatch:
    def test_extract_and_miss(self, spark):
        from polars_net_spark import col

        df = pl.LazyFrame(spark.createDataFrame(
            [(1, '{"a": {"b": 7}, "c": "x"}'), (2, "not json"), (3, None)],
            "id long, j string"))
        out = df.select(
            col("id"),
            col("j").str.json_path_match("$.a.b").alias("ab"),
            col("j").str.json_path_match("$.c").alias("c"),
            col("j").str.json_path_match("$.zzz").alias("z"),
        ).sort("id").collect().rows()
        assert out[0][1:] == ("7", "x", None)
        assert out[1][1:] == (None, None, None)
        assert out[2][1:] == (None, None, None)
