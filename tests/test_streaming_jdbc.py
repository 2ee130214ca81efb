"""streaming_jdbc_sink end-to-end against embedded Derby: the reference's
SinkTo (Polars.FSharp/Types.fs:1395-1444) streams result batches into a DB
via ArrowToDbStream — here a foreachBatch sink drives write_jdbc's
per-partition parallel append, with delete-then-insert idempotence per
micro-batch id."""

import os
import tempfile

import pyspark.sql.functions as F

import polars_net_spark as pl
from polars_net_spark.streaming import streaming_jdbc_sink

URL = "jdbc:derby:memory:pnsstream;create=true"
DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
PROPS = {"driver": DRIVER}


def _drop(spark, table):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    try:
        st.executeUpdate(f"DROP TABLE {table}")
    except Exception:
        pass
    st.close()
    conn.close()


def _src_dir(spark, rows, n_files):
    d = tempfile.mkdtemp(prefix="sjdbc_src_")
    spark.createDataFrame(rows, "id int, grp string, v double").repartition(
        n_files
    ).write.mode("overwrite").parquet(d)
    return d


def _run_stream(spark, src, table, ckpt=None):
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_jdbc_sink(
        stream, URL, table,
        checkpoint=ckpt or tempfile.mkdtemp(prefix="sjdbc_ckpt_"),
        properties=PROPS,
    )
    q.awaitTermination(180)
    q.stop()


def _read_back(spark, table):
    sdf = (
        spark.read.format("jdbc")
        .option("url", URL)
        .option("dbtable", table)
        .option("driver", DRIVER)
        .load()
    )
    return sorted(
        tuple(r) for r in sdf.select("id", "grp", "v").collect()
    )


def test_multi_batch_append_matches_source(spark):
    rows = [(i, "ab"[i % 2], float(i)) for i in range(40)]
    src = _src_dir(spark, rows, 4)
    _drop(spark, "sj_out")
    _run_stream(spark, src, "sj_out")
    assert _read_back(spark, "sj_out") == sorted(rows)
    # micro-batches really were multiple (maxFilesPerTrigger=1, 4 files)
    ids = (
        spark.read.format("jdbc").option("url", URL)
        .option("dbtable", "sj_out").option("driver", DRIVER).load()
        .select("batch_id").distinct().count()
    )
    assert ids >= 2


def test_replay_is_idempotent(spark):
    """A replayed run with a FRESH checkpoint re-delivers every batch —
    delete-then-insert on batch_id must converge to the same table, not
    double it (the at-least-once → exactly-once contract)."""
    rows = [(i, "g", float(i) * 0.5) for i in range(12)]
    src = _src_dir(spark, rows, 3)
    _drop(spark, "sj_replay")
    _run_stream(spark, src, "sj_replay")
    first = _read_back(spark, "sj_replay")
    # replay from scratch: same source, new checkpoint → same batch ids
    _run_stream(spark, src, "sj_replay")
    assert _read_back(spark, "sj_replay") == first == sorted(rows)


def test_stable_across_three_runs(spark):
    rows = [(i, "xyz"[i % 3], float((i * 7) % 11)) for i in range(30)]
    src = _src_dir(spark, rows, 3)
    outs = []
    for _ in range(3):
        _drop(spark, "sj_stable")
        _run_stream(spark, src, "sj_stable")
        outs.append(_read_back(spark, "sj_stable"))
    assert outs[0] == outs[1] == outs[2] == sorted(rows)


def test_plain_append_mode(spark):
    rows = [(1, "a", 1.0), (2, "b", 2.0)]
    src = _src_dir(spark, rows, 1)
    _drop(spark, "sj_plain")
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = streaming_jdbc_sink(
        stream, URL, "sj_plain",
        checkpoint=tempfile.mkdtemp(prefix="sjdbc_ckpt_"),
        properties=PROPS, batch_id_col=None,
    )
    q.awaitTermination(120)
    q.stop()
    assert _read_back(spark, "sj_plain") == sorted(rows)
