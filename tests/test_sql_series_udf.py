"""SQLContext, Series facade, UDF surface (FIXTURES F1/F13;
oracles SqlTests.cs:6-41, UDFTests.fs:43-195, SeriesTests.cs)."""

import pytest

import polars_net_spark as pl
from polars_net_spark import SQLContext, Series, col


def test_sql_roundtrip(spark, people):
    ctx = SQLContext(people=people)
    out = ctx.execute(
        "SELECT name, salary * 2 AS s2 FROM people WHERE age > 26 ORDER BY s2 DESC"
    ).collect()
    assert out.rows() == [("Charlie", 600.0), ("Bob", 400.0)]
    assert "people" in ctx.tables()


def test_sql_group_by(spark):
    df = pl.from_records([("a", 1.0), ("a", 3.0), ("b", 5.0)], ["k", "v"])
    ctx = SQLContext(t=df)
    out = ctx.execute("SELECT k, avg(v) AS m FROM t GROUP BY k ORDER BY k").collect()
    assert out.rows() == [("a", 2.0), ("b", 5.0)]


def test_series_basics(spark):
    s = Series("x", [1, 2, 3, None])
    assert s.len() == 4
    assert s.sum() == 6
    assert s.null_count() == 1
    assert s.name == "x"
    assert s.rename("y").name == "y"
    assert (s + 1).to_list()[0] == 2


def test_series_comparisons_aggs(spark):
    s = Series("x", [1.0, 2.0, 3.0])
    assert s.gt(1.5).to_list() == [False, True, True]
    assert s.mean() == 2.0
    assert s.min() == 1.0 and s.max() == 3.0


def test_series_cast_and_frame(spark):
    s = Series("x", ["1", "2", "bad"])
    c = s.cast("i64")
    assert c.to_list() == [1, 2, None]
    df = s.to_frame()
    assert df.height == 3


def test_udf_map_vectorized(spark):
    df = pl.from_records([(1,), (2,), (None,)], ["x"])
    out = df.select(col("x").map(lambda s: s * 10, return_dtype="i64").alias("y"))
    assert [r[0] for r in out.rows()] == [10, 20, None]


def test_udf_map_elements_dtype_change(spark):
    df = pl.from_records([(1,), (2,)], ["x"])
    out = df.select(
        col("x").map_elements(lambda v: f"v{v}", return_dtype="str").alias("y")
    )
    assert [r[0] for r in out.rows()] == ["v1", "v2"]


def test_udf_error_propagates(spark):
    # UDFTests.fs:71-94: failing UDF aborts the query
    df = pl.from_records([(1,)], ["x"])

    def boom(s):
        raise RuntimeError("udf failure")

    with pytest.raises(Exception):
        df.select(col("x").map(boom, return_dtype="i64").alias("y")).rows()


def test_udf_requires_dtype(spark):
    df = pl.from_records([(1,)], ["x"])
    with pytest.raises(ValueError):
        df.select(col("x").map(lambda s: s))


def test_map_column_same_as_input_dtype(spark):
    # reference udf.rs:106: Unknown marker = same-as-input output dtype
    df = pl.from_records([(1,), (2,)], "x long")
    out = df.map_column("x", lambda s: s * 10)
    assert dict(out.dtypes)["x"] == "bigint"
    assert [r[0] for r in out.rows()] == [10, 20]
    changed = df.map_column("x", lambda s: s.astype(str), return_dtype="str")
    assert dict(changed.dtypes)["x"] == "string"


class TestSeriesPositionalR4:
    def test_elementwise_and_positional(self, spark):
        import polars_net_spark as pl

        s = pl.Series("x", [3.7, -1.2, None, 5.0])
        assert s.abs().to_list() == [3.7, 1.2, None, 5.0]
        assert s.round().to_list() == [4.0, -1.0, None, 5.0]
        assert s.fill_null(0.0).to_list() == [3.7, -1.2, 0.0, 5.0]
        assert s.sort().to_list() == [None, -1.2, 3.7, 5.0]
        assert s.head(2).to_list() == [3.7, -1.2]
        assert s.filter(lambda c: c > 0).sort().to_list() == [3.7, 5.0]
        assert s.append(pl.Series("y", [9.0])).len() == 5
        assert pl.Series("x", [1.0, 2.0, 3.0]).shift(1).to_list() == [None, 1.0, 2.0]


def test_pl_sql_inline_frames(spark):
    import polars_net_spark as pl

    d = pl.from_records([(1, "x"), (2, "y")], ["i", "s"]).lazy()
    out = pl.sql("SELECT s, i*10 AS v FROM t WHERE i > 1", t=d).collect().rows()
    assert out == [("y", 20)]
