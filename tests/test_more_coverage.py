"""Coverage for surfaces not exercised elsewhere: stateful streaming, stream
sources, remaining Expr/Series/list/dt/str methods, frame utilities."""

import datetime as dt

import pytest

import polars_net_spark as pl
from polars_net_spark import Series, col, lit


# -- Expr odds and ends -------------------------------------------------------


def test_clip_ceil_floor_neg(spark):
    df = pl.from_records([(2.7,), (-1.2,), (9.9,)], ["x"])
    out = df.select(
        col("x").clip(0.0, 5.0).alias("c"),
        col("x").ceil().alias("ce"),
        col("x").floor().alias("fl"),
        (-col("x")).alias("n"),
    )
    rows = out.rows()
    assert [r[0] for r in rows] == [2.7, 0.0, 5.0]
    assert rows[0][1:] == (3, 2, -2.7)


def test_xor_is_finite_infinite(spark):
    df = pl.from_records([(True, False, 1.0), (True, True, float("inf"))], ["a", "b", "x"])
    out = df.select(
        (col("a") ^ col("b")).alias("x_or"),
        col("x").is_finite().alias("fin"),
        col("x").is_infinite().alias("inf"),
    )
    assert out.rows()[0] == (True, True, False)
    assert out.rows()[1] == (False, False, True)


def test_rank_and_cum_minmax(spark):
    df = pl.from_records([(1, 3.0), (2, 1.0), (3, 2.0)], ["i", "x"])
    out = df.select(
        col("i"),
        col("x").rank("dense").alias("r"),
        col("x").cum_min(order_by=[col("i")]).alias("cmin"),
        col("x").cum_max(order_by=[col("i")]).alias("cmax"),
        col("x").cum_count(order_by=[col("i")]).alias("ccnt"),
    ).sort("i")
    rows = out.rows()
    assert [r[1] for r in rows] == [3, 1, 2]
    assert [r[2] for r in rows] == [3.0, 1.0, 1.0]
    assert [r[3] for r in rows] == [3.0, 3.0, 3.0]
    assert [r[4] for r in rows] == [1, 2, 3]


def test_quantiles_multi(spark):
    df = pl.from_records([(float(i),) for i in range(1, 5)], ["x"])
    out = df.select(col("x").quantiles([0.5, 1.0]).alias("q"))
    assert out.rows()[0][0] == [2.5, 4.0]


def test_approx_n_unique(spark):
    df = pl.from_records([(i % 10,) for i in range(100)], ["x"])
    approx = df.select(col("x").approx_n_unique().alias("n")).rows()[0][0]
    assert 8 <= approx <= 12


# -- str/dt/list odds and ends ------------------------------------------------


def test_str_json_decode_concat(spark):
    df = pl.from_records([('{"k": 7}', "a")], ["j", "s"])
    out = df.select(
        col("j").str.json_decode("struct<k:int>").alias("d"),
        col("s").str.concat(lit("b"), sep="-").alias("c"),
    )
    r = out.rows()[0]
    assert r[0]["k"] == 7 and r[1] == "a-b"


def test_str_replace_literal(spark):
    df = pl.from_records([("a.b.c",)], ["s"])
    out = df.select(col("s").str.replace_all(".", "_", literal=True).alias("r"))
    assert out.rows()[0][0] == "a_b_c"


def test_dt_convert_tz_totals(spark):
    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = pl.from_records([(t,)], ["ts"])
    out = df.select(col("ts").dt.convert_time_zone("Asia/Tokyo").alias("tok"))
    assert out.rows()[0][0] == dt.datetime(2024, 1, 1, 21, 0, 0)  # UTC+9 wall clock


def test_list_reverse_unique_slice(spark):
    df = pl.from_records([([1, 2, 2, 3],)], ["xs"])
    out = df.select(
        col("xs").list.reverse().alias("r"),
        col("xs").list.unique().alias("u"),
        col("xs").list.slice(1, 2).alias("s"),
    )
    r = out.rows()[0]
    assert r[0] == [3, 2, 2, 1]
    assert sorted(r[1]) == [1, 2, 3]
    assert r[2] == [2, 2]


# -- Series -------------------------------------------------------------------


def test_series_slice_and_item(spark):
    s = Series("x", [10, 20, 30, 40])
    sl = s.slice(1, 2)
    assert sl.to_list() == [20, 30]
    assert s.item(2) == 30
    assert s[0] == 10


def test_series_is_nan_to_arrow(spark):
    # NB: pandas NaN becomes Spark NULL at ingestion; produce a true NaN via
    # sqrt(-1) to exercise the NaN path
    s = Series("x", [1.0, -1.0])
    nan_s = Series._from_lazy(
        s._lf.select(col("x").sqrt().alias("x")), "x"
    )
    assert nan_s.is_nan().to_list() == [False, True]
    assert s.to_arrow().length() == 2


# -- selectors ----------------------------------------------------------------


def test_temporal_list_struct_selectors(spark):
    df = pl.from_records(
        [(dt.datetime(2024, 1, 1), [1], 5)], ["ts", "xs", "n"]
    ).select(col("ts"), col("xs"), pl.as_struct([col("n")]).alias("st"))
    assert pl.cs.temporal().resolve(df.schema) == ["ts"]
    assert pl.cs.list_().resolve(df.schema) == ["xs"]
    assert pl.cs.struct_().resolve(df.schema) == ["st"]


# -- frame utilities ----------------------------------------------------------


def test_fetch_and_collect_streaming(people):
    assert people.lazy().fetch(2).height == 2
    assert people.lazy().collect_streaming().height == 3


def test_explain_contains_scan(people):
    text = people.lazy().filter(col("age") > 0).explain()
    assert "Filter" in text


def test_repartition_and_hint(people):
    lf = people.lazy().repartition(4)
    assert lf._sdf.rdd.getNumPartitions() == 4
    assert people.lazy().hint("merge").join(people.lazy(), on="name").collect().height == 3


def test_write_bucketed_roundtrip(spark, people):
    people.lazy().write_bucketed("bucketed_people", ["name"], num_buckets=4)
    back = spark.table("bucketed_people")
    assert back.count() == 3
    spark.sql("DROP TABLE bucketed_people")


def test_map_batches_sink(people):
    # executor-side callback per partition (can't mutate driver state; just
    # verify it executes without error on the real path)
    people.lazy().map_batches_sink(lambda rows: sum(1 for _ in rows))


# -- llm extras ---------------------------------------------------------------


def test_bpe_ish_token_count(spark):
    from polars_net_spark.llm.text import bpe_ish_token_count
    from pyspark.sql import functions as F

    df = pl.from_records([("hello, world42",)], ["text"])
    n = df.spark.select(bpe_ish_token_count(F.col("text")).alias("n")).collect()[0][0]
    assert n == 4  # hello | , | world | 42


def test_dedup_without_normalize(spark):
    from polars_net_spark.llm import dedup_exact

    docs = pl.from_records([(0, "A  b"), (1, "a b")], ["doc_id", "text"])
    strict = dedup_exact(docs.lazy(), normalize=False).collect()
    assert strict.height == 2  # whitespace/case differ → not dups
    norm = dedup_exact(docs.lazy(), normalize=True).collect()
    assert norm.height == 1


def test_minhash_candidates_only(spark):
    from polars_net_spark.llm import minhash_lsh_pairs

    docs = pl.from_records(
        [(0, "x y z x y z x y z"), (1, "x y z x y z x y q")], ["doc_id", "text"]
    )
    cands = minhash_lsh_pairs(docs.lazy(), threshold=0.1, verify=False).collect()
    assert cands.columns == ["id_a", "id_b"]


def test_release_caches_idempotent(spark):
    from polars_net_spark import release_caches

    assert release_caches() >= 0
    assert release_caches() == 0


# -- streaming extras ---------------------------------------------------------


def test_stream_rate_source(spark):
    from polars_net_spark.streaming import scan_stream_rate

    sf = scan_stream_rate(rows_per_second=100, spark=spark).filter(col("value") >= 0)
    q = sf.write_memory("rate_out", trigger={"processingTime": "1 second"})
    import time

    time.sleep(3)
    q.stop()
    assert spark.sql("SELECT count(*) FROM rate_out").collect()[0][0] >= 0


def test_stream_stateful_apply(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    from polars_net_spark.streaming import scan_stream_parquet

    schema = T.StructType(
        [
            T.StructField("user", T.StringType(), True),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    src = str(tmp_path / "src")
    spark.createDataFrame([("u1", 1.0), ("u1", 2.0), ("u2", 5.0)], schema).write.parquet(src)

    def running_sum(key, pdfs, state):
        total = state.get[0] if state.exists else 0.0
        for pdf in pdfs:
            total += pdf["v"].sum()
        state.update((float(total),))
        yield pd.DataFrame({"user": [key[0]], "total": [float(total)]})

    sf = scan_stream_parquet(src, schema, spark=spark).apply_in_pandas_with_state(
        running_sum,
        output_schema="user string, total double",
        state_schema="total double",
        group_by=["user"],
        output_mode="update",
        timeout=GroupStateTimeout.NoTimeout,
    )
    q = sf.write_memory("state_out", output_mode="update")
    q.awaitTermination(60)
    q.stop()
    out = {r["user"]: r["total"] for r in spark.sql("SELECT * FROM state_out").collect()}
    assert out == {"u1": 3.0, "u2": 5.0}


def test_describe_approx_mode(spark):
    """approx percentiles (the 100 TB mode) agree with exact at high accuracy
    on a small frame; all non-percentile stats are identical."""
    df = pl.from_records([(float(i),) for i in range(101)], ["x"])
    exact = df.describe().rows()
    approx = df.describe(exact_percentiles=False, accuracy=10_000).rows()
    ex = {r[0]: r[1] for r in exact}
    ap = {r[0]: r[1] for r in approx}
    for stat in ("count", "null_count", "mean", "std", "min", "max"):
        assert ex[stat] == ap[stat]
    for stat in ("25%", "50%", "75%"):
        assert abs(ex[stat] - ap[stat]) <= 1.0  # GK sketch within one element


class TestHistogramFrame:
    def test_equi_width_known(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.operators.describe import histogram_frame

        d = pl.from_records([(float(i),) for i in range(10)], ["x"]).lazy()
        rows = histogram_frame(d, "x", n_bins=5, lo=0.0, hi=10.0).collect().rows()
        assert [(r[0], r[3]) for r in sorted(rows)] == [
            (0, 2), (1, 2), (2, 2), (3, 2), (4, 2)
        ]
        assert sorted(rows)[0][1:3] == (0.0, 2.0)

    def test_auto_edges_max_closed_and_empty_bins(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.operators.describe import histogram_frame

        # auto lo/hi from data; max value lands in the LAST bin; the middle
        # bin is empty but still emitted with count 0
        d = pl.from_records([(0.0,), (1.0,), (9.0,), (10.0,)], ["x"]).lazy()
        rows = sorted(histogram_frame(d, "x", n_bins=5).collect().rows())
        assert [r[3] for r in rows] == [2, 0, 0, 0, 2]

    def test_by_key_shared_edges(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.operators.describe import histogram_frame

        d = pl.from_records(
            [("a", 1.0), ("a", 2.0), ("b", 9.0)], ["k", "x"]
        ).lazy()
        rows = histogram_frame(d, "x", n_bins=2, lo=0.0, hi=10.0, by="k").collect().rows()
        got = {(r[0], r[1]): r[4] for r in rows}
        # every key emits every bin (grid), shared global edges
        assert got == {("a", 0): 2, ("a", 1): 0, ("b", 0): 0, ("b", 1): 1}

    def test_degenerate_constant(self, spark):
        import polars_net_spark as pl
        from polars_net_spark.operators.describe import histogram_frame

        d = pl.from_records([(5.0,), (5.0,)], ["x"]).lazy()
        rows = sorted(histogram_frame(d, "x", n_bins=3).collect().rows())
        assert sum(r[3] for r in rows) == 2 and rows[0][3] == 2

    def test_all_null_column_clear_error(self, spark):
        import pytest
        from pyspark.sql import functions as F
        import polars_net_spark as pl
        from polars_net_spark.operators.describe import histogram_frame

        d = pl.from_records([(1.0,), (2.0,)], ["x"]).lazy()
        empty = d._sdf.select(F.lit(None).cast("double").alias("x"))
        with pytest.raises(ValueError, match="pass lo= and hi="):
            histogram_frame(empty, "x").collect()
        # explicit edges still work on an empty column: all-zero counts
        rows = histogram_frame(empty, "x", n_bins=3, lo=0.0, hi=3.0).collect().rows()
        assert len(rows) == 3 and all(r[3] == 0 for r in rows)
