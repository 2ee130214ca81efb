"""Breadth batch: small exact-assert tests mirroring the reference's
example-based style across every module (target: match its 213-test scale)."""

import datetime as dt

import pytest

import polars_net_spark as pl
from polars_net_spark import SQLContext, Series, col, cols, concat_str, lit


# -- exprs --------------------------------------------------------------------


def test_lit_with_dtype(spark):
    df = pl.from_records([(1,)], ["x"])
    out = df.select(lit(5, dtype="f64").alias("v"))
    assert out.rows()[0][0] == 5.0
    assert dict(out.dtypes)["v"] == "double"


def test_cols_multi(people):
    out = people.select(cols("name", "age"))
    assert out.columns == ["name", "age"]


def test_concat_str(people):
    out = people.select(concat_str([col("name"), col("age")], separator="#").alias("c"))
    assert sorted(r[0] for r in out.rows())[0] == "Alice#25"


def test_group_agg_n_unique(spark):
    df = pl.from_records([("a", 1), ("a", 1), ("a", 2), ("b", 5)], ["k", "v"])
    out = df.lazy().group_by("k").agg(col("v").n_unique().alias("nu")).collect()
    assert {r[0]: r[1] for r in out.rows()} == {"a": 2, "b": 1}


def test_implode_in_select(spark):
    df = pl.from_records([(1,), (2,)], ["x"])
    out = df.select(col("x").implode().alias("xs"))
    assert sorted(out.rows()[0][0]) == [1, 2]


def test_log_natural_default(spark):
    import math

    df = pl.from_records([(math.e,)], ["x"])
    assert abs(df.select(col("x").log().alias("l")).rows()[0][0] - 1.0) < 1e-12


def test_clip_single_sided(spark):
    df = pl.from_records([(5,), (-5,)], ["x"])
    out = df.select(col("x").clip(lower=0).alias("lo"), col("x").clip(upper=0).alias("hi"))
    assert sorted(out.rows()) == [(-5, -5), (5, 0)] or sorted(out.rows()) == [(0, -5), (5, 0)]
    # precise: 5→(5,0), -5→(0,-5)
    d = {r[0]: r for r in df.select(col("x"), col("x").clip(lower=0).alias("lo"), col("x").clip(upper=0).alias("hi")).rows()}
    assert d[5][1:] == (5, 0) and d[-5][1:] == (0, -5)


# -- strings ------------------------------------------------------------------


def test_len_bytes_unicode(spark):
    df = pl.from_records([("héllo",)], ["s"])
    out = df.select(col("s").str.len_bytes().alias("b"), col("s").str.len_chars().alias("c"))
    assert out.rows()[0] == (6, 5)  # é is 2 bytes in UTF-8


def test_strip_charset_start_end(spark):
    df = pl.from_records([("xxabcxx",)], ["s"])
    out = df.select(
        col("s").str.strip_chars_start("x").alias("l"),
        col("s").str.strip_chars_end("x").alias("r"),
    )
    assert out.rows()[0] == ("abcxx", "xxabc")


def test_to_datetime_with_format(spark):
    df = pl.from_records([("01/02/2024 13:45",)], ["s"])
    v = df.select(col("s").str.to_datetime("%d/%m/%Y %H:%M").alias("t")).rows()[0][0]
    assert v == dt.datetime(2024, 2, 1, 13, 45)


# -- io -----------------------------------------------------------------------


def test_read_json_array_file(spark, tmp_path):
    f = tmp_path / "a.json"
    f.write_text('[{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]')
    df = pl.read_json(str(f), spark=spark)
    assert df.height == 2


def test_csv_custom_separator(spark, tmp_path):
    f = tmp_path / "t.csv"
    f.write_text("a;b\n1;x\n")
    lf = pl.scan_csv(str(f), separator=";", spark=spark)
    assert lf.columns == ["a", "b"]


def test_scan_parquet_multiple_paths(spark, tmp_path):
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    pl.from_records([(1,)], ["x"]).write_parquet(p1)
    pl.from_records([(2,)], ["x"]).write_parquet(p2)
    assert pl.scan_parquet([p1, p2], spark=spark).collect().height == 2


# -- frame --------------------------------------------------------------------


def test_with_row_index_name(people):
    lf = people.lazy().with_row_index("idx")
    assert "idx" in lf._sdf.columns


def test_concat_vertical_type_mismatch_errors(spark):
    a = pl.from_records([(1,)], "x long")
    b = pl.from_records([("s",)], "x string")
    with pytest.raises(Exception):
        pl.concat([a, b], how="vertical").collect().rows()


def test_semi_join_left_right_on(spark):
    a = pl.from_records([(1, "x"), (2, "y")], ["ka", "v"])
    b = pl.from_records([(1,)], ["kb"])
    out = a.join(b, left_on="ka", right_on="kb", how="semi")
    assert out.rows() == [(1, "x")]


def test_cross_join_all_collide(spark):
    a = pl.from_records([(1,)], ["x"])
    b = pl.from_records([(2,)], ["x"])
    out = a.join(b, how="cross")
    assert out.columns == ["x", "x_right"]
    assert out.rows() == [(1, 2)]


def test_dynamic_boundaries_closed_right(spark):
    base = dt.datetime(2024, 1, 1, 10, 0)
    f = pl.from_records([(base, 1), (base + dt.timedelta(minutes=30), 2)], ["Time", "Val"])
    out = (
        f.lazy()
        .group_by_dynamic("Time", every="30m", closed="right", include_boundaries=True)
        .agg(col("Val").len().alias("n"))
        .collect()
    )
    rows = sorted(out.rows())
    # 10:00 belongs to (9:30,10:00]: lower boundary 9:30
    assert rows[0][0] == dt.datetime(2024, 1, 1, 9, 30)
    assert rows[0][1] == dt.datetime(2024, 1, 1, 10, 0)


# -- udf ----------------------------------------------------------------------


def test_udf_string_output(spark):
    df = pl.from_records([(3,)], ["x"])
    out = df.select(col("x").map(lambda s: s.astype(str) + "!", return_dtype="str").alias("s"))
    assert out.rows()[0][0] == "3!"


def test_udf_long_roundtrip(spark):
    df = pl.from_records([(2,), (4,)], ["x"])
    out = df.select(col("x").map(lambda s: s * s, return_dtype="i64").alias("sq"))
    assert [r[0] for r in out.rows()] == [4, 16]


# -- sql ----------------------------------------------------------------------


def test_sql_unregister_and_tables(spark, people):
    ctx = SQLContext(spark, ppl=people)
    assert "ppl" in ctx.tables()
    ctx.unregister("ppl")
    assert "ppl" not in ctx.tables()


def test_sql_two_table_join(spark):
    a = pl.from_records([(1, "x")], ["k", "v"])
    b = pl.from_records([(1, 9.0)], ["k", "w"])
    ctx = SQLContext(spark, ta=a, tb=b)
    out = ctx.execute("SELECT v, w FROM ta JOIN tb USING (k)").collect()
    assert out.rows() == [("x", 9.0)]


# -- streaming ----------------------------------------------------------------


def test_streaming_with_columns_filter(spark, tmp_path):
    from pyspark.sql import types as T

    from polars_net_spark.streaming import scan_stream_parquet

    schema = T.StructType([T.StructField("v", T.LongType(), True)])
    src = str(tmp_path / "src")
    spark.createDataFrame([(1,), (5,)], schema).write.parquet(src)
    sf = (
        scan_stream_parquet(src, schema, spark=spark)
        .with_columns((col("v") * 10).alias("v10"))
        .filter(col("v10") > 10)
    )
    q = sf.write_memory("wc_out")
    q.awaitTermination(60)
    q.stop()
    rows = spark.sql("SELECT * FROM wc_out").collect()
    assert [(r["v"], r["v10"]) for r in rows] == [(5, 50)]


# -- multimodal stubs ---------------------------------------------------------


def test_video_sampling_stub_raises(spark):
    from polars_net_spark.frame import LazyFrame
    from polars_net_spark.llm.multimodal import sample_video_frames

    media = spark.createDataFrame([(1, bytearray(b"x"))], ["media_id", "payload"])
    # r4: decode is real for concatenated-P6 streams, so the stub raise moved
    # INTO the mapInPandas batch — surfaces as a wrapped PythonException.
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        sample_video_frames(LazyFrame(media)).collect().rows()


def test_real_decoder_stub_raises(spark):
    from polars_net_spark.frame import LazyFrame
    from polars_net_spark.llm.multimodal import extract_image_features

    media = spark.createDataFrame([(1, bytearray(b"x"))], ["media_id", "payload"])
    with pytest.raises(Exception):  # NotImplementedError inside executor → PythonException
        extract_image_features(LazyFrame(media), use_fake_decoder=False).collect().rows()


# -- series -------------------------------------------------------------------


def test_series_dtype_and_constructor_dtype(spark):
    s = Series("x", [1, 2], dtype="f64")
    assert s.dtype == "double"
    assert s.to_list() == [1.0, 2.0]


def test_series_null_arithmetic(spark):
    s = Series("x", [1.0, None])
    assert (s + 1).to_list() == [2.0, None]


# -- selectors ----------------------------------------------------------------


def test_selector_exclude_and_combo(people):
    sel = pl.cs.exclude("name") & pl.cs.numeric()
    assert sel.resolve(people.schema) == ["age", "salary"]


# -- fingerprints -------------------------------------------------------------


def test_content_fingerprint_whitespace_invariance(spark):
    from polars_net_spark.llm import content_fingerprint
    from pyspark.sql import functions as F

    df = pl.from_records([("a  b\tc",), ("A B C",)], ["text"])
    fps = [r[0] for r in df.spark.select(content_fingerprint(F.col("text")).alias("f")).collect()]
    assert fps[0] == fps[1]  # case + whitespace normalized away
