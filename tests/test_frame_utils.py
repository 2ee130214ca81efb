"""null_count / glimpse / transpose / partition_by (eager utilities)."""

import pytest

import polars_net_spark as pl


@pytest.fixture(scope="module")
def frame(spark):
    return pl.from_records(
        [(1, "a", 1.0), (2, "b", None), (3, "a", 3.0), (4, None, None)],
        ["id", "cat", "v"],
    )


def test_null_count(frame):
    row = frame.null_count().rows()[0]
    assert row == (0, 1, 2)


def test_null_count_lazy(frame):
    assert frame.lazy().null_count().collect().rows()[0] == (0, 1, 2)


def test_glimpse(frame, capsys):
    out = frame.glimpse()
    assert "Rows: 4" in out and "$ cat <string>" in out
    assert capsys.readouterr().out  # printed too


def test_transpose(spark):
    df = pl.from_records([(1, 2), (3, 4)], ["a", "b"])
    t = df.transpose()
    assert t.columns == ["column", "column_0", "column_1"]
    rows = {r[0]: (r[1], r[2]) for r in t.rows()}
    assert rows["a"] == ("1", "3") and rows["b"] == ("2", "4")


def test_transpose_named_no_header(spark):
    df = pl.from_records([(1, 2)], ["a", "b"])
    t = df.transpose(include_header=False, column_names=["only"])
    assert t.columns == ["only"]


def test_transpose_guard(spark):
    df = pl.from_records([(i,) for i in range(5)], ["x"])
    with pytest.raises(ValueError, match="transpose on >"):
        df.transpose(max_rows=3)


def test_partition_by(frame):
    parts = frame.partition_by("cat", as_dict=True)
    assert set(parts) == {("a",), ("b",), (None,)}
    assert parts[("a",)].height == 2
    assert parts[(None,)].rows()[0][0] == 4


def test_partition_by_list_and_guard(frame):
    parts = frame.partition_by("cat")
    assert len(parts) == 3
    with pytest.raises(ValueError, match="partition_by would produce"):
        frame.partition_by("id", max_partitions=2)
    with pytest.raises(ValueError):
        frame.partition_by()


class TestHistRanges:
    def test_hist(self, spark):
        df = pl.from_records([(v,) for v in [1.0, 5.0, 10.0, 10.5, 25.0, 99.0]], ["x"])
        out = df.lazy().hist("x", [0, 10, 20, 30]).sort("bin_start").collect().rows()
        # (0,10]: 1,5,10 ; (10,20]: 10.5 ; (20,30]: 25 ; 99 dropped
        assert [(r[0], r[1], r[2]) for r in out] == [
            (0.0, 10.0, 3), (10.0, 20.0, 1), (20.0, 30.0, 1),
        ]

    def test_hist_min_edge_in_first_bin(self, spark):
        """polars closes the first bin on the left: a value exactly equal to
        bins[0] is counted, not dropped (round-3 advice item)."""
        df = pl.from_records([(v,) for v in [0.0, 0.0, 5.0, 10.0]], ["x"])
        out = df.lazy().hist("x", [0, 10, 20]).sort("bin_start").collect().rows()
        assert [(r[0], r[1], r[2]) for r in out] == [(0.0, 10.0, 4), (10.0, 20.0, 0)]

    def test_hist_empty_bin_and_guard(self, spark):
        import pytest as _pt

        df = pl.from_records([(1.0,)], ["x"])
        out = df.hist("x", [0, 1, 2]).rows()
        assert out[1][2] == 0  # empty bin kept
        with _pt.raises(ValueError):
            df.hist("x", [1, 1, 2])
        with _pt.raises(ValueError):
            df.hist("x", [3])

    def test_int_range(self, spark):
        assert pl.int_range(0, 5).collect().rows() == [(0,), (1,), (2,), (3,), (4,)]
        assert pl.int_range(0, 10, 3, name="n").collect().rows() == [(0,), (3,), (6,), (9,)]

    def test_datetime_range_closed_modes(self, spark):
        import datetime as dt

        a, b = "2024-01-01", "2024-01-01T03:00:00"
        both = pl.datetime_range(a, b, "1h").collect().rows()
        assert len(both) == 4
        assert both[0][0] == dt.datetime(2024, 1, 1, 0, 0)
        assert both[-1][0] == dt.datetime(2024, 1, 1, 3, 0)
        assert len(pl.datetime_range(a, b, "1h", closed="left").collect().rows()) == 3
        assert len(pl.datetime_range(a, b, "1h", closed="right").collect().rows()) == 3
        assert len(pl.datetime_range(a, b, "1h", closed="none").collect().rows()) == 2
        # end off-grid: nothing to drop on the right
        off = pl.datetime_range(a, "2024-01-01T02:30:00", "1h", closed="left").collect().rows()
        assert len(off) == 3

    def test_date_range(self, spark):
        import datetime as dt

        out = pl.date_range("2024-01-01", "2024-01-04", "1d").collect().rows()
        assert out[0][0] == dt.date(2024, 1, 1) and len(out) == 4

    def test_range_errors(self, spark):
        import pytest as _pt

        with _pt.raises(ValueError):
            pl.datetime_range("2024-01-02", "2024-01-01", "1h")
        with _pt.raises(ValueError):
            pl.datetime_range("2024-01-01", "2024-01-02", "1h", closed="weird")


class TestFrameAggs:
    def test_sum_mean_min_max(self, spark):
        df = pl.from_records(
            [(1, 2.0, "b"), (3, 4.0, "a")], ["i", "v", "s"]
        )
        s = df.lazy().sum().collect().rows()[0]
        assert s == (4, 6.0, None)  # string sum -> null
        m = df.lazy().mean().collect().rows()[0]
        assert m == (2.0, 3.0, None)
        assert df.min().rows()[0] == (1, 2.0, "a")  # min/max cover strings
        assert df.max().rows()[0] == (3, 4.0, "b")
        md = df.median().rows()[0]
        assert md[0] == 2.0 and md[1] == 3.0
        st = df.std().rows()[0]
        assert round(st[1], 9) == round((2.0) ** 0.5, 9)


class TestStackInsertStableSort:
    def test_vstack_hstack_extend(self, spark):
        a = pl.from_records([(1, "x")], ["i", "s"])
        b = pl.from_records([(2, "y")], ["i", "s"])
        assert a.vstack(b).height == 2 and a.extend(b).height == 2
        c = pl.from_records([("z",)], ["t"])
        h = a.hstack(c)
        assert h.columns == ["i", "s", "t"] and h.rows()[0] == (1, "x", "z")

    def test_column_index_insert_replace(self, spark):
        from polars_net_spark import col, lit

        df = pl.from_records([(1, 2)], ["a", "b"])
        assert df.get_column_index("b") == 1
        import pytest as _pt

        with _pt.raises(ValueError):
            df.get_column_index("zzz")
        ins = df.insert_column(1, lit(9).alias("m"))
        assert ins.columns == ["a", "m", "b"]
        rep = df.replace_column(0, (col("a") * 10).alias("a10"))
        assert rep.columns == ["a10", "b"] and rep.rows()[0] == (10, 2)
        with _pt.raises(ValueError):
            df.insert_column(7, lit(1).alias("x"))

    def test_stable_sort(self, spark):
        rows = [(1, "a"), (0, "b"), (1, "c"), (0, "d"), (1, "e")]
        lf = pl.from_records(rows, ["k", "tag"]).lazy()
        out = lf.sort("k", maintain_order=True).collect().rows()
        # ties keep input order
        assert [r[1] for r in out] == ["b", "d", "a", "c", "e"]
        assert [c for c, _ in lf.sort("k", maintain_order=True).dtypes] == ["k", "tag"]


class TestFrameCast:
    def test_mapping_and_all(self, spark):
        df = pl.from_records([("1", 2.7, "x")], ["a", "b", "c"])
        out = df.lazy().cast({"a": "i64", "b": "i32"}).collect()
        assert dict(out.dtypes) == {"a": "bigint", "b": "int", "c": "string"}
        assert out.rows()[0] == (1, 2, "x")
        allstr = df.cast("str")
        assert all(t == "string" for _, t in allstr.dtypes)

    def test_strict_and_unknown(self, spark):
        import pytest as _pt

        df = pl.from_records([("abc",)], ["a"])
        assert df.cast({"a": "f64"}).rows()[0][0] is None  # non-strict -> null
        with _pt.raises(Exception):
            df.cast({"a": "f64"}, strict=True).rows()
        with _pt.raises(ValueError):
            df.cast({"zzz": "f64"})


class TestAlignConcat:
    def test_align_variants(self, spark):
        a = pl.from_records([(1, "x"), (2, "y")], ["k", "a"]).lazy()
        b = pl.from_records([(2, "Y"), (3, "Z")], ["k", "b"]).lazy()
        full = pl.concat([a, b], how="align").collect().rows()
        assert [(r[0], r[1], r[2]) for r in full] == [
            (1, "x", None), (2, "y", "Y"), (3, None, "Z"),
        ]
        inner = pl.concat([a, b], how="align_inner").collect().rows()
        assert inner == [(2, "y", "Y")]
        left = pl.concat([a, b], how="align_left").collect().rows()
        assert [(r[0],) for r in left] == [(1,), (2,)]

    def test_align_no_common(self, spark):
        import pytest as _pt

        a = pl.from_records([(1,)], ["x"]).lazy()
        b = pl.from_records([(1,)], ["y"]).lazy()
        with _pt.raises(ValueError):
            pl.concat([a, b], how="align")


class TestMergeSortedGather:
    def test_merge_sorted(self, spark):
        a = pl.from_records([(1, "a"), (3, "a"), (5, "a")], ["k", "src"]).lazy()
        b = pl.from_records([(2, "b"), (3, "b"), (4, "b")], ["k", "src"]).lazy()
        out = a.merge_sorted(b, "k").collect().rows()
        assert out == [(1, "a"), (2, "b"), (3, "a"), (3, "b"), (4, "b"), (5, "a")]

    def test_merge_sorted_column_mismatch(self, spark):
        import pytest as _pt

        a = pl.from_records([(1,)], ["k"]).lazy()
        b = pl.from_records([(1, 2)], ["k", "v"]).lazy()
        with _pt.raises(ValueError):
            a.merge_sorted(b, "k")

    def test_gather_every(self, spark):
        d = pl.from_records([(i,) for i in range(10)], ["x"]).lazy()
        assert [r[0] for r in d.gather_every(3).collect().rows()] == [0, 3, 6, 9]
        assert [r[0] for r in d.gather_every(3, 1).collect().rows()] == [1, 4, 7]
        import pytest as _pt

        with _pt.raises(ValueError):
            d.gather_every(0)

    def test_dense_row_index_multi_partition(self, spark):
        """Dense index must be 0..n-1 in scan order even across many
        partitions (partition-offset arithmetic, no global window)."""
        big = pl.LazyFrame(spark.range(0, 500, 1, 7).selectExpr("id as x"))
        rows = big.with_dense_row_index("i").collect().rows()
        assert sorted(r[1] for r in rows) == list(range(500))
        # index follows scan order: x ascending within this deterministic range
        by_idx = sorted(rows, key=lambda r: r[1])
        assert [r[0] for r in by_idx] == sorted(r[0] for r in rows)


class TestUniqueKeepNone:
    def test_keep_none_drops_all_dupes(self, spark):
        d = pl.from_records(
            [(1, "a"), (1, "b"), (2, "c"), (3, "d")], ["k", "v"]
        ).lazy()
        out = sorted(d.unique(subset=["k"], keep="none").collect().rows())
        assert out == [(2, "c"), (3, "d")]

    def test_keep_none_full_row(self, spark):
        d = pl.from_records([(1, "a"), (1, "a"), (1, "b")], ["k", "v"]).lazy()
        out = d.unique(keep="none").collect().rows()
        assert out == [(1, "b")]


class TestSamplingExtrasR4:
    def test_temperature_weights(self, spark):
        from polars_net_spark.llm import temperature_weights

        w = temperature_weights({"a": 100, "b": 1}, alpha=0.5)
        assert w["a"] == pytest.approx(10 / 11) and w["b"] == pytest.approx(1 / 11)
        flat = temperature_weights({"a": 100, "b": 1}, alpha=0.0)
        assert flat["a"] == pytest.approx(0.5)
        nat = temperature_weights({"a": 100, "b": 1}, alpha=1.0)
        assert nat["a"] == pytest.approx(100 / 101)
        with pytest.raises(ValueError):
            temperature_weights({})
        with pytest.raises(ValueError):
            temperature_weights({"a": 0})

    def test_shuffle_by_hash_deterministic(self, spark):
        import hashlib
        from polars_net_spark.llm import shuffle_by_hash

        d = pl.from_records([(i,) for i in range(20)], ["doc_id"]).lazy()
        got = [r[0] for r in shuffle_by_hash(d, "doc_id", seed="s").collect().rows()]
        expect = sorted(range(20), key=lambda i: hashlib.md5(f"s{i}".encode()).hexdigest())
        assert got == expect
        # reruns identical
        again = [r[0] for r in shuffle_by_hash(d, "doc_id", seed="s").collect().rows()]
        assert got == again


class TestListToStruct:
    def test_width_and_fields(self, spark):
        from polars_net_spark import col

        d = pl.from_records([(1, [10.0, 20.0, 30.0]), (2, [5.0])], ["i", "v"]).lazy()
        rows = [
            r.asDict(recursive=True)
            for r in d.select(
                col("i"), col("v").list.to_struct(2).alias("s")
            ).sort("i")._sdf.collect()
        ]
        assert rows[0]["s"] == {"field_0": 10.0, "field_1": 20.0}
        assert rows[1]["s"] == {"field_0": 5.0, "field_1": None}
        with pytest.raises(ValueError):
            col("v").list.to_struct(2, fields=["only"])


class TestProfile:
    def test_profile_metrics(self, spark):
        lf = pl.from_records([(i % 3, float(i)) for i in range(50)], ["k", "v"]).lazy()
        res, prof = lf.group_by("k").agg(pl.col("v").sum().alias("s")).profile()
        assert res.height == 3
        assert any("HashAggregate" in p["node"] for p in prof)
        agg_rows = [
            p["metrics"].get("numOutputRows")
            for p in prof
            if "HashAggregate" in p["node"]
        ]
        assert any(r == 3 for r in agg_rows)  # final agg emitted 3 groups
        assert all(isinstance(p["depth"], int) for p in prof)


class TestRenameSchemaEquals:
    def test_rename_callable(self, spark):
        d = pl.from_records([(1, "x")], ["ab", "cd"]).lazy()
        assert d.rename(str.upper).collect().columns == ["AB", "CD"]
        assert d.rename({"ab": "zz"}).collect().columns == ["zz", "cd"]

    def test_collect_schema_and_equals(self, spark):
        d = pl.from_records([(1, "x")], ["ab", "cd"]).lazy()
        assert d.collect_schema() == {"ab": "bigint", "cd": "string"}
        assert d.equals(d)
        assert not d.equals(d.rename({"ab": "zz"}))


def test_map_batches_transform(spark):
    d = pl.from_records([(1, 2.0), (3, 4.0)], ["a", "b"]).lazy()
    out = d.map_batches(
        lambda pdf: pdf.assign(c=pdf.a + pdf.b), "a long, b double, c double"
    ).collect()
    assert sorted(out.rows()) == [(1, 2.0, 3.0), (3, 4.0, 7.0)]


class TestMatchToSchema:
    def test_insert_cast_reorder_drop(self, spark):
        import polars_net_spark as pl

        d = pl.from_records([(1, "a", 2.5)], ["x", "s", "extra"]).lazy()
        out = d.match_to_schema({"s": "string", "x": "f64", "missing": "i64"})
        got = out.collect()
        assert got.columns == ["s", "x", "missing"]
        assert got.rows() == [("a", 1.0, None)]

    def test_raise_modes(self, spark):
        import pytest

        import polars_net_spark as pl

        d = pl.from_records([(1,)], ["x"]).lazy()
        with pytest.raises(ValueError, match="missing column"):
            d.match_to_schema({"x": "i64", "y": "i64"}, missing_columns="raise")
        d2 = pl.from_records([(1, 2)], ["x", "y"]).lazy()
        with pytest.raises(ValueError, match="extra columns"):
            d2.match_to_schema({"x": "i64"}, extra_columns="raise")
        with pytest.raises(ValueError, match="cast=False"):
            d.match_to_schema({"x": "string"}, cast=False)


class TestHllSketches:
    def test_rollup_matches_exact_within_tolerance(self, spark):
        from polars_net_spark.operators.sketches import (
            distinct_sketches, rollup_sketches, sketch_estimate,
        )
        from pyspark.sql import functions as F

        d = spark.range(0, 50000).select(
            (F.col("id") % 10).alias("g"), (F.col("id") % 9000).alias("v")
        )
        sk = distinct_sketches(d, "v", by="g")
        grand = sketch_estimate(rollup_sketches(sk)).spark.collect()[0]["approx_distinct"]
        exact = d.select("v").distinct().count()
        assert abs(grand - exact) / exact < 0.03
        # rollup touches only the 10 sketch rows, never the raw 50k
        assert sk.spark.count() == 10


def test_plan_summary_counts(spark):
    import polars_net_spark as pl
    from polars_net_spark import col

    a = pl.scan_parquet("/root/testdata/sf0.001/orders.parquet")
    b = pl.scan_parquet("/root/testdata/sf0.001/customer.parquet")
    j = a.join(b, left_on="o_custkey", right_on="c_custkey").group_by(
        "o_orderpriority"
    ).agg(col("o_totalprice").sum().alias("s"))
    ps = j.plan_summary()
    assert ps["cartesian"] == 0 and ps["nested_loop_joins"] == 0
    assert ps["scans"] == 2
    assert ps["broadcast_joins"] + ps["sort_merge_joins"] >= 1
    assert ps["aggregates"] >= 2  # partial + final
    assert ps["python_stages"] == 0


def test_dataframe_iteration_yields_series_and_rejects_int_index(spark):
    import pytest

    import polars_net_spark as pl

    d = pl.from_records([(1, "a"), (2, "b")], ["x", "s"])
    cols = list(d)
    assert [c.name for c in cols] == ["x", "s"]
    assert cols[0].to_list() == [1, 2]
    with pytest.raises(TypeError, match="column name"):
        d[0]


def test_to_html(spark):
    import polars_net_spark as pl

    d = pl.from_records([(1, "a<b"), (2, None)], ["x", "s"])
    h = d.to_html()
    assert "<table" in h and "a&lt;b" in h and "null" in h
    assert "<th>x<br/>" in h
    # truncation marker
    big = pl.from_records([(i,) for i in range(5)], ["x"])
    assert "…" in big.to_html(max_rows=2)
    assert "…" not in big.to_html(max_rows=10)
