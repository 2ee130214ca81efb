"""Structured Streaming: file source → watermark → windowed/session aggs →
memory/foreachBatch sinks, driven end-to-end with availableNow triggers."""

import datetime as dt
import time

import pytest

import polars_net_spark as pl
from polars_net_spark import col
from polars_net_spark.streaming import scan_stream_parquet
from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user", T.StringType(), True),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(path)


def _await(query, timeout=60):
    query.awaitTermination(timeout)
    query.stop()


def test_stream_windowed_agg(spark, tmp_path):
    src = str(tmp_path / "src")
    base = dt.datetime(2024, 1, 1, 10, 0)
    _write_batch(
        spark,
        src,
        [
            (base, "a", 1.0),
            (base + dt.timedelta(minutes=10), "a", 2.0),
            (base + dt.timedelta(minutes=40), "a", 4.0),
        ],
    )
    sf = (
        scan_stream_parquet(src, SCHEMA, spark=spark)
        .with_watermark("ts", "1h")
        .group_by_window("ts", every="30m", group_by=["user"])
        .agg(col("v").sum().alias("s"))
    )
    # append+watermark only emits windows the watermark has passed; a one-shot
    # availableNow run ends before that, so assert via complete mode
    q = sf.write_memory("win_out", output_mode="complete")
    _await(q)
    out = {
        (r["window"]["start"].minute, r["user"]): r["s"]
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert out == {(0, "a"): 3.0, (30, "a"): 4.0}


def test_stream_session_window(spark, tmp_path):
    src = str(tmp_path / "src")
    base = dt.datetime(2024, 1, 1, 10, 0)
    _write_batch(
        spark,
        src,
        [
            (base, "u", 1.0),
            (base + dt.timedelta(minutes=5), "u", 1.0),  # same session (gap 10m)
            (base + dt.timedelta(minutes=60), "u", 1.0),  # new session
        ],
    )
    sf = (
        scan_stream_parquet(src, SCHEMA, spark=spark)
        .with_watermark("ts", "2h")
        .group_by_session("ts", gap="10m", group_by=["user"])
        .agg(col("v").len().alias("n"))
    )
    q = sf.write_memory("sess_out", output_mode="complete")
    _await(q)
    ns = sorted(r["n"] for r in spark.sql("SELECT * FROM sess_out").collect())
    assert ns == [1, 2]


def test_stream_foreach_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(spark, src, [(dt.datetime(2024, 1, 1), "x", 5.0)])
    seen = []

    def sink(df, epoch_id):
        seen.append(df.count())

    sf = scan_stream_parquet(src, SCHEMA, spark=spark).filter(col("v") > 0)
    q = sf.foreach_batch(sink)
    _await(q)
    assert sum(seen) == 1


def test_stream_requires_streaming_df(spark, people):
    from polars_net_spark.streaming import StreamingFrame

    with pytest.raises(ValueError):
        StreamingFrame(people.spark)


def test_stream_dedup_exact(spark, tmp_path):
    src = str(tmp_path / "dedup_src")
    doc_schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    base = dt.datetime(2024, 1, 1, 10, 0)
    spark.createDataFrame(
        [
            (base, 1, "hello  world"),
            (base, 2, "Hello world"),      # dup after normalization
            (base, 3, "something else"),
            (base, 4, "hello world "),     # dup after normalization
        ],
        doc_schema,
    ).write.mode("append").parquet(src)
    sf = scan_stream_parquet(src, doc_schema, spark=spark).dedup_exact("text")
    q = sf.write_memory("dedup_out", output_mode="append")
    _await(q)
    rows = spark.sql("SELECT doc_id FROM dedup_out ORDER BY doc_id").collect()
    kept = [r["doc_id"] for r in rows]
    assert len(kept) == 2 and 3 in kept  # one of {1,2,4} + doc 3
    assert "__key__" not in spark.sql("SELECT * FROM dedup_out").columns


def test_stream_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "dedup_wm_src")
    base = dt.datetime(2024, 1, 1, 10, 0)
    _write_batch(
        spark,
        src,
        [
            (base, "a", 1.0),
            (base + dt.timedelta(minutes=1), "a", 1.0),  # dup key (user, v)
            (base + dt.timedelta(minutes=2), "b", 2.0),
        ],
    )
    sf = (
        scan_stream_parquet(src, SCHEMA, spark=spark)
        .with_watermark("ts", "1h")
        .drop_duplicates_within_watermark(["user", "v"])
    )
    q = sf.write_memory("dedup_wm_out", output_mode="append")
    _await(q)
    rows = spark.sql("SELECT user, v FROM dedup_wm_out").collect()
    assert sorted((r["user"], r["v"]) for r in rows) == [("a", 1.0), ("b", 2.0)]


def test_stream_quality_filter_and_split(spark, tmp_path):
    """Corpus-quality rules and hash splits are pure Column expressions, so
    they compose with Structured Streaming unchanged: stream in documents,
    gate on the Gopher verdict, assign stable splits, sink."""
    from polars_net_spark.llm import gopher_quality_frame, split_by_hash
    from polars_net_spark.streaming import StreamingFrame

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    src = str(tmp_path / "docs_src")
    good = "the cat sat on the mat and that was that with the hat of it again"
    spark.createDataFrame(
        [(0, good), (1, "spark spark spark"), (2, good + " twice over now")],
        doc_schema,
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema(doc_schema).parquet(src)
    gated = gopher_quality_frame(stream, min_words=5, min_stop_hits=2)._sdf.filter(
        F.col("passes")
    )
    labeled = split_by_hash(gated.select("doc_id"), "doc_id")._sdf
    q = (
        labeled.writeStream.format("memory")
        .queryName("quality_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    rows = {r["doc_id"]: r["split"] for r in spark.sql("SELECT * FROM quality_stream_out").collect()}
    assert set(rows) == {0, 2}  # doc 1 fails the stopword rule
    assert all(s in ("train", "val", "test") for s in rows.values())


def test_stream_stream_join(spark, tmp_path):
    """Watermarked stream-stream equi-join with an event-time bound in the
    join condition (the shape whose state Spark can evict)."""
    left, right = str(tmp_path / "l"), str(tmp_path / "r")
    base = dt.datetime(2024, 1, 1, 10, 0)
    _write_batch(
        spark,
        left,
        [
            (base, "a", 1.0),
            (base + dt.timedelta(minutes=30), "a", 2.0),
            (base, "b", 5.0),
        ],
    )
    _write_batch(
        spark,
        right,
        [
            (base + dt.timedelta(minutes=5), "a", 10.0),
            (base + dt.timedelta(minutes=60), "a", 20.0),
        ],
    )
    lf = scan_stream_parquet(left, SCHEMA, spark=spark).with_watermark("ts", "1h")
    rf = scan_stream_parquet(right, SCHEMA, spark=spark).with_watermark("ts", "1h")
    out = lf.join_stream(rf, on="user", left_ts="ts", within="15m")
    assert sorted(out._sdf.columns) == ["ts", "ts_right", "user", "v", "v_right"]
    q = out.write_memory("ssj_out")
    _await(q)
    rows = spark.sql("SELECT user, v, v_right FROM ssj_out").collect()
    # only (10:00,a) x (10:05,a) is within 15m; 'b' has no right rows
    assert [(r["user"], r["v"], r["v_right"]) for r in rows] == [("a", 1.0, 10.0)]


def test_stream_stream_join_multi_key_rename(spark, tmp_path):
    left, right = str(tmp_path / "l2"), str(tmp_path / "r2")
    base = dt.datetime(2024, 1, 1, 10, 0)
    _write_batch(spark, left, [(base, "a", 1.0)])
    _write_batch(spark, right, [(base, "a", 9.0), (base, "c", 9.0)])
    lf = scan_stream_parquet(left, SCHEMA, spark=spark).with_watermark("ts", "1h")
    rf = scan_stream_parquet(right, SCHEMA, spark=spark).with_watermark("ts", "1h")
    out = lf.join_stream(rf, on=["user"], left_ts="ts", right_ts="ts", within="1m")
    q = out.write_memory("ssj2_out")
    _await(q)
    rows = spark.sql("SELECT * FROM ssj2_out").collect()
    assert len(rows) == 1 and rows[0]["user"] == "a" and rows[0]["v_right"] == 9.0


def test_apply_in_pandas_with_state(spark, tmp_path):
    """Custom stateful operator: per-user running total via
    applyInPandasWithState (GroupState-backed, append mode)."""
    import pandas as pd

    src = str(tmp_path / "state_src")
    base = dt.datetime(2024, 1, 1, 10, 0)
    _write_batch(
        spark,
        src,
        [
            (base, "a", 1.0),
            (base + dt.timedelta(minutes=1), "a", 2.0),
            (base, "b", 5.0),
        ],
    )

    def running_total(key, pdfs, state):
        total = state.get[0] if state.exists else 0.0
        n = 0
        for pdf in pdfs:
            total += float(pdf["v"].sum())
            n += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user": [key[0]], "total": [total], "n": [n]})

    sf = scan_stream_parquet(src, SCHEMA, spark=spark).apply_in_pandas_with_state(
        running_total,
        "user string, total double, n long",
        "total double",
        group_by=["user"],
        output_mode="append",
    )
    q = sf.write_memory("state_out")
    _await(q)
    got = {
        r["user"]: (r["total"], r["n"])
        for r in spark.sql("SELECT * FROM state_out").collect()
    }
    assert got == {"a": (3.0, 2), "b": (5.0, 1)}


def test_stream_corpus_prep_ops_compose(spark, tmp_path):
    """The r4 map-only corpus ops (URL canonicalization, masked-LM
    corruption) run unchanged inside a streaming pipeline — pure Column
    math has no batch/stream divide."""
    from polars_net_spark.llm import mask_tokens_frame, url_normalize
    from polars_net_spark.streaming import scan_stream_parquet

    doc_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("url", T.StringType(), True),
        ]
    )
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "HTTPS://A.com:443/x?utm_s=1"),
            (2, "one two three four five six seven", "http://b.co.uk/y/"),
        ],
        doc_schema,
    ).write.mode("append").parquet(src)

    stream = scan_stream_parquet(src, schema=doc_schema)
    canon = stream.with_columns(
        pl.Expr(url_normalize(F.col("url"))).alias("url_canonical")
    )
    masked_sdf = mask_tokens_frame(
        canon._sdf, mask_rate=0.4, seed="st"
    )._sdf.join(canon._sdf.select("doc_id", "url_canonical"), "doc_id")
    q = (
        masked_sdf.writeStream.format("memory")
        .queryName("corpus_prep_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    q.stop()
    rows = {r["doc_id"]: r for r in spark.sql("SELECT * FROM corpus_prep_stream").collect()}
    assert rows[1]["url_canonical"] == "https://a.com/x"
    assert rows[2]["url_canonical"] == "http://b.co.uk/y"
    assert rows[1]["n_tokens"] == 6 and rows[1]["n_masked"] >= 1
    assert rows[1]["corrupted"].count("<MASK>") == rows[1]["n_masked"]


def test_stream_static_join_drift(spark, tmp_path):
    """Stream-static equi-join inside a streaming query (the q223 shape):
    a static reference-share table joins onto the stream by bin, a tumbling
    window counts per (window, bin)."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "drift_src")
    base = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        (base, "u", 1.0),
        (base + dt.timedelta(minutes=5), "u", 1.0),
        (base + dt.timedelta(minutes=10), "u", 9.0),
        (base + dt.timedelta(hours=6), "u", 9.0),
    ]
    _write_batch(spark, src, rows)
    ref = spark.createDataFrame([(0, 0.5), (1, 0.5)], ["bin", "p_ref"])
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).parquet(src)
        .withColumn("bin", F.when(F.col("v") < 5, 0).otherwise(1))
        .join(ref, "bin")
        .groupBy(F.window("ts", "6 hours").alias("w"), "bin")
        .agg(F.count(F.lit(1)).alias("n_cur"), F.first("p_ref").alias("p_ref"))
    )
    q = (
        stream.writeStream.format("memory").queryName("drift_out")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    q.stop()
    got = {
        (r["w"]["start"].hour, r["bin"]): (r["n_cur"], r["p_ref"])
        for r in spark.table("drift_out").collect()
    }
    assert got == {(0, 0): (2, 0.5), (0, 1): (1, 0.5), (6, 1): (1, 0.5)}
