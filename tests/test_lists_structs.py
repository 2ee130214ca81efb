"""List & struct namespaces (FIXTURES F5/F6; oracles ComplexTests.fs:130-220)."""

import polars_net_spark as pl
from polars_net_spark import as_struct, col


def test_list_ops(spark):
    df = pl.from_records([([3, 1, 2],)], ["xs"])
    out = df.select(
        col("xs").list.first().alias("f"),
        col("xs").list.get(1).alias("g"),
        col("xs").list.get(-1).alias("gn"),
        col("xs").list.len().alias("n"),
        col("xs").list.sum().alias("s"),
        col("xs").list.min().alias("mn"),
        col("xs").list.max().alias("mx"),
        col("xs").list.mean().alias("me"),
        col("xs").list.sort().alias("srt"),
        col("xs").list.sort(descending=True).alias("srtd"),
        col("xs").list.contains(2).alias("c"),
    )
    r = out.rows()[0]
    assert r[:8] == (3, 1, 2, 3, 6.0, 1, 3, 2.0)
    assert r[8] == [1, 2, 3] and r[9] == [3, 2, 1] and r[10] is True


def test_list_join_nulls(spark):
    df = pl.from_records([(["a", None, "b"],)], ["xs"])
    out = df.select(
        col("xs").list.join(",").alias("ign"),
        col("xs").list.join(",", ignore_nulls=False).alias("strict"),
    )
    assert out.rows()[0] == ("a,b", None)


def test_list_get_oob(spark):
    df = pl.from_records([([1],)], ["xs"])
    assert df.select(col("xs").list.get(5).alias("g")).rows()[0][0] is None


def test_explode_implode_roundtrip(spark):
    df = pl.from_records([(1, [10, 20])], ["id", "xs"])
    exploded = df.explode("xs")
    back = exploded.lazy().group_by("id").agg(col("xs").implode().alias("xs")).collect()
    assert sorted(back.rows()[0][1]) == [10, 20]


def test_struct_ops(spark):
    df = pl.from_records([("n1", 5)], ["name", "age"])
    packed = df.select(as_struct([col("name"), col("age")]).alias("s"))
    out = packed.select(
        col("s").struct.field("name").alias("n"),
        col("s").struct.field_by_index(1, field_names=["name", "age"]).alias("a"),
        col("s").struct.json_encode().alias("j"),
    )
    r = out.rows()[0]
    assert r[0] == "n1" and r[1] == 5
    assert '"name":"n1"' in r[2]


def test_struct_field_by_index_frame_level(spark):
    df = pl.from_records([("n1", 5)], ["name", "age"])
    packed = df.select(as_struct([col("name"), col("age")]).alias("s"))
    out = packed.lazy().struct_field_by_index("s", 1, alias="a").collect()
    assert out.filter(col("a") == 5).height == 1


def test_struct_rename_fields(spark):
    df = pl.from_records([("x", 1)], ["a", "b"])
    packed = df.select(as_struct([col("a"), col("b")]).alias("s"))
    renamed = packed.lazy().struct_rename_fields("s", ["p", "q"]).collect()
    assert [f.name for f in renamed.schema["s"].dataType.fields] == ["p", "q"]


class TestListPosEpoch:
    def test_list_positions(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        sdf = spark.createDataFrame(
            [(1, [3, 1, 3, 2]), (2, []), (3, None)], "id long, xs array<int>"
        )
        out = pl.LazyFrame(sdf).select(
            col("id"),
            col("xs").list.n_unique().alias("nu"),
            col("xs").list.index_of(3).alias("i3"),
            col("xs").list.index_of(9).alias("i9"),
            col("xs").list.arg_max().alias("am"),
            col("xs").list.arg_min().alias("an"),
        ).sort("id").collect().rows()
        assert out[0][1:] == (3, 0, None, 0, 1)
        assert out[1][1:] == (0, None, None, None, None)
        assert out[2][1:] == (None, None, None, None, None)

    def test_epoch_units(self, spark):
        import datetime as dt
        import polars_net_spark as pl
        from polars_net_spark import col

        t = dt.datetime(2024, 1, 2, 0, 0, 1, 500000)
        sdf = spark.createDataFrame([(1, t)], "id long, ts timestamp")
        out = pl.LazyFrame(sdf).select(
            col("ts").dt.epoch("us").alias("us"),
            col("ts").dt.epoch("ns").alias("ns"),
            col("ts").dt.epoch("ms").alias("ms"),
            col("ts").dt.epoch("s").alias("s"),
            col("ts").dt.epoch("d").alias("d"),
        ).collect().rows()[0]
        base = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        assert out == (base, base * 1000, base // 1000, base // 1_000_000, base // 86_400_000_000)
        import pytest as _pt

        with _pt.raises(ValueError):
            col("ts").dt.epoch("weeks")


class TestListSets:
    def test_set_ops(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        sdf = spark.createDataFrame(
            [(1, [1, 2, 2, 3], [2, 4])], "id long, a array<int>, b array<int>"
        )
        out = pl.LazyFrame(sdf).select(
            col("a").list.set_union(col("b")).alias("u"),
            col("a").list.set_intersection(col("b")).alias("i"),
            col("a").list.set_difference(col("b")).alias("d"),
        ).collect().rows()[0]
        assert sorted(out[0]) == [1, 2, 3, 4]
        assert list(out[1]) == [2]
        assert sorted(out[2]) == [1, 3]
