"""Selector algebra (FIXTURES F12; oracles SelectorTests.fs:19-183)."""

import polars_net_spark as pl
from polars_net_spark import col, cs


def wide(spark):
    return pl.from_records(
        [(1, 2.5, "n", True)], ["val_a", "val_b", "name", "flag"]
    )


def test_all_exclude(spark):
    df = wide(spark)
    assert cs.all_().resolve(df.schema) == ["val_a", "val_b", "name", "flag"]
    assert cs.exclude("name").resolve(df.schema) == ["val_a", "val_b", "flag"]


def test_patterns(spark):
    df = wide(spark)
    assert cs.starts_with("val_").resolve(df.schema) == ["val_a", "val_b"]
    assert cs.ends_with("_b").resolve(df.schema) == ["val_b"]
    assert cs.contains("al").resolve(df.schema) == ["val_a", "val_b"]
    assert cs.matches(r"^v.*a$").resolve(df.schema) == ["val_a"]


def test_dtype_selectors(spark):
    df = wide(spark)
    assert cs.numeric().resolve(df.schema) == ["val_a", "val_b"]
    assert cs.string().resolve(df.schema) == ["name"]
    assert cs.boolean().resolve(df.schema) == ["flag"]


def test_algebra(spark):
    df = wide(spark)
    s = cs.starts_with("val_") & cs.numeric()
    assert s.resolve(df.schema) == ["val_a", "val_b"]
    s = cs.numeric() | cs.boolean()
    assert s.resolve(df.schema) == ["val_a", "val_b", "flag"]
    s = ~cs.numeric()
    assert s.resolve(df.schema) == ["name", "flag"]
    s = cs.numeric() - cs.ends_with("_b")
    assert s.resolve(df.schema) == ["val_a"]


def test_map_cols(spark):
    df = wide(spark)
    exprs = cs.numeric().map_cols(df.schema, lambda e: e * 2)
    out = df.select(exprs)
    assert out.columns == ["val_a", "val_b"]
    assert out.rows()[0] == (2, 5.0)


def test_select_with_selector_exprs(spark):
    df = wide(spark)
    out = df.select(cs.starts_with("val_").to_exprs(df.schema))
    assert out.columns == ["val_a", "val_b"]


def test_selectors_inline_in_select(spark):
    """polars UX: a Selector can appear directly in select/with_columns —
    resolved against the frame's schema, no explicit .resolve() needed."""
    import polars_net_spark as pl
    import polars_net_spark.selectors as cs

    d = pl.from_records([(1, 2.0, "x")], ["a", "b", "c"]).lazy()
    assert d.select(pl.all()).collect().columns == ["a", "b", "c"]
    assert d.select(pl.exclude("c")).collect().columns == ["a", "b"]
    assert d.select(cs.numeric()).collect().columns == ["a", "b"]
    mixed = d.select(cs.string(), pl.col("a")).collect()
    assert mixed.columns == ["c", "a"]
