"""Frame ops (FIXTURES F8, F11; reference DataFrameTests.cs / LazyFrameTests.cs)."""

import pytest

import polars_net_spark as pl
from polars_net_spark import col, lit


def test_with_columns_drop_rename(people):
    out = people.with_columns((col("salary") / 10).alias("bonus")).drop("age").rename({"name": "who"})
    assert out.columns == ["who", "salary", "bonus"]
    assert out.filter(col("who") == "Alice").rows()[0][2] == 10.0


def test_drop_nulls_fill_null(spark):
    df = pl.from_records([(1, "a"), (None, "b"), (3, None)], ["x", "y"])
    assert df.drop_nulls().height == 1
    assert df.drop_nulls(subset=["x"]).height == 2
    assert df.fill_null(0, subset=["x"]).filter(col("x") == 0).height == 1


def test_unique(spark):
    df = pl.from_records([(1, "a"), (1, "a"), (2, "b"), (1, "c")], ["x", "y"])
    assert df.unique().height == 3
    assert df.unique(subset=["x"]).height == 2
    kept = df.unique(subset=["x"], keep="first", maintain_order=True)
    assert sorted(kept.rows()) == [(1, "a"), (2, "b")]


def test_head_tail_limit(spark):
    df = pl.from_records([(i,) for i in range(10)], ["x"])
    assert df.head(3).height == 3
    assert sorted(r[0] for r in df.tail(2).rows()) == [8, 9]


def test_sample(spark):
    df = pl.from_records([(i,) for i in range(100)], ["x"])
    assert df.sample_n(10, seed=1).height == 10
    frac = df.sample_frac(0.5, seed=1).height
    assert 20 <= frac <= 80  # Bernoulli, documented approximate


def test_explode_single_and_multi(spark):
    df = pl.from_records([(1, [10, 20], ["a", "b"])], ["id", "nums", "tags"])
    single = df.explode("nums")
    assert sorted((r[0], r[1]) for r in single.rows()) == [(1, 10), (1, 20)]
    multi = df.explode("nums", "tags")
    assert sorted((r[1], r[2]) for r in multi.rows()) == [(10, "a"), (20, "b")]


def test_unnest(spark):
    base = pl.from_records([(1, 5, "x")], ["id", "a", "b"])
    df = base.select(col("id"), pl.as_struct([col("a"), col("b")]).alias("s"))
    out = df.unnest("s")
    assert out.columns == ["id", "a", "b"]
    assert out.rows()[0] == (1, 5, "x")


def test_unpivot_default_on(spark):
    df = pl.from_records([("r1", 1.0, 2.0)], ["id", "m1", "m2"])
    out = df.unpivot(index=["id"])
    assert sorted(out.rows()) == [("r1", "m1", 1.0), ("r1", "m2", 2.0)]


def test_pivot_aggs(spark):
    df = pl.from_records(
        [("a", "m1", 1.0), ("a", "m1", 3.0), ("a", "m2", 2.0), ("b", "m1", 5.0)],
        ["id", "metric", "value"],
    )
    s = df.pivot("id", "metric", "value", "sum")
    d = {r[0]: (r[1], r[2]) for r in s.rows()}
    assert d == {"a": (4.0, 2.0), "b": (5.0, None)}
    mx = df.pivot("id", "metric", "value", "max")
    d = {r[0]: (r[1], r[2]) for r in mx.rows()}
    assert d["a"] == (3.0, 2.0)
    cnt = df.pivot("id", "metric", "value", "count")
    d = {r[0]: (r[1], r[2]) for r in cnt.rows()}
    assert d["a"] == (2, 1)


def test_concat_vertical_diagonal_horizontal(spark):
    a = pl.from_records([(1, "x")], ["k", "v"])
    b = pl.from_records([(2, "y")], ["k", "v"])
    v = pl.concat([a, b], how="vertical").collect()
    assert v.height == 2
    c = pl.from_records([(3, 1.5)], ["k", "w"])
    d = pl.concat([a, c], how="diagonal").collect()
    assert d.columns == ["k", "v", "w"]
    assert sorted(d.rows(), key=str) == sorted([(1, "x", None), (3, None, 1.5)], key=str)
    h = pl.concat(
        [pl.from_records([(1,), (2,)], ["x"]), pl.from_records([("p",), ("q",)], ["y"])],
        how="horizontal",
    ).collect()
    assert h.rows() == [(1, "p"), (2, "q")]


def test_concat_horizontal_unequal_heights_raises(spark):
    a = pl.from_records([(1,), (2,)], ["x"])
    b = pl.from_records([(1,)], ["y"])
    with pytest.raises(ValueError):
        pl.concat([a, b], how="horizontal")


def test_describe(people):
    d = people.describe()
    stats = {r[0]: r for r in d.rows()}
    assert stats["count"][1] == 3.0
    assert stats["mean"][2] == 200.0
    assert stats["50%"][1] == 30.0


def test_sort_multi_directions(people):
    out = people.sort(["age"], descending=[True])
    assert [r[0] for r in out.rows()] == ["Charlie", "Bob", "Alice"]


def test_group_by_maintain_order(spark):
    df = pl.from_records([("b", 1), ("a", 2), ("b", 3), ("c", 4)], ["k", "v"])
    out = df.lazy().group_by("k", maintain_order=True).agg(col("v").sum().alias("s")).collect()
    assert [r[0] for r in out.rows()] == ["b", "a", "c"]


def test_item_and_shape(people):
    assert people.shape == (3, 3)
    assert people.sort("age").item(0, "name") == "Alice"


def test_top_k(people):
    out = people.lazy().top_k(2, by="salary").collect()
    assert [r[0] for r in out.rows()] == ["Charlie", "Bob"]


def test_rows_as_dataclass(people):
    from dataclasses import dataclass

    @dataclass
    class Person:
        name: str
        age: int
        salary: float

    ppl = people.sort("age").rows_as(Person)
    assert ppl[0] == Person("Alice", 25, 100.0)


def test_collect_async(people):
    fut = people.lazy().filter(col("age") > 26).collect_async()
    assert fut.result(timeout=60).height == 2


def test_repr_html(people):
    assert "<table" in people._repr_html_()


def test_group_by_head_tail(spark):
    import polars_net_spark as pl
    from polars_net_spark import col

    rows = [("a", i) for i in range(5)] + [("b", i) for i in range(2)]
    df = pl.from_records(rows, ["g", "i"]).lazy()
    head = df.group_by("g").head(2, order_by=[col("i")]).collect()
    assert sorted(map(tuple, head.rows())) == [("a", 0), ("a", 1), ("b", 0), ("b", 1)]
    tail = df.group_by("g").tail(2, order_by=[col("i")]).collect()
    assert sorted(map(tuple, tail.rows())) == [("a", 3), ("a", 4), ("b", 0), ("b", 1)]
    # default ordering = hidden row-order column (frame order)
    h1 = df.group_by("g").head(1).collect()
    assert sorted(map(tuple, h1.rows())) == [("a", 0), ("b", 0)]
    # plan prunes map-side: WindowGroupLimit present
    plan = df.group_by("g").head(2, order_by=[col("i")])._sdf._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
