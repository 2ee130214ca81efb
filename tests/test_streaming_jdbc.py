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


def test_delete_failure_fails_the_batch(spark):
    """A genuine DELETE failure (here: batch_id column typed VARCHAR, so
    Derby rejects the integer comparison) must FAIL the micro-batch — not
    be swallowed and followed by an insert that duplicates a replayed
    batch.  Regression test for the r11 `except Exception: pass`."""
    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    _drop(spark, "sj_fail")
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    st.executeUpdate(
        'CREATE TABLE sj_fail ("id" INT, "grp" VARCHAR(8), "v" DOUBLE, '
        '"batch_id" VARCHAR(8))'
    )
    st.close()
    conn.close()
    rows = [(1, "a", 1.0), (2, "b", 2.0)]
    src = _src_dir(spark, rows, 1)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = streaming_jdbc_sink(
        stream, URL, "sj_fail",
        checkpoint=tempfile.mkdtemp(prefix="sjdbc_ckpt_"),
        properties=PROPS,
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(120)
    q.stop()
    # the failed DELETE must block the INSERT: no rows, no silent duplicates
    n = (
        spark.read.format("jdbc").option("url", URL)
        .option("dbtable", "sj_fail").option("driver", DRIVER).load().count()
    )
    assert n == 0
    _drop(spark, "sj_fail")


def test_bad_identifiers_rejected_up_front(spark):
    import pytest

    rows = [(1, "a", 1.0)]
    src = _src_dir(spark, rows, 1)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    with pytest.raises(ValueError, match="not a plain"):
        streaming_jdbc_sink(stream, URL, "x; DROP TABLE y", properties=PROPS)
    with pytest.raises(ValueError, match="batch_id_col"):
        streaming_jdbc_sink(
            stream, URL, "ok_table", properties=PROPS,
            batch_id_col='b" OR 1=1',
        )


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
