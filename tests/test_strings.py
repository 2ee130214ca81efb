"""String namespace (FIXTURES F7; reference oracles ExprTests.fs:187-283)."""

import polars_net_spark as pl
from polars_net_spark import col


def frame(spark, *vals):
    return pl.from_records([(v,) for v in vals], ["raw"])


def test_case_len(spark):
    df = frame(spark, "AbC")
    out = df.select(
        col("raw").str.to_uppercase().alias("u"),
        col("raw").str.to_lowercase().alias("l"),
        col("raw").str.len_bytes().alias("nb"),
        col("raw").str.len_chars().alias("nc"),
    )
    assert out.rows()[0] == ("ABC", "abc", 3, 3)


def test_strip_variants(spark):
    df = frame(spark, "  abc  ")
    out = df.select(
        col("raw").str.strip_chars().alias("t"),
        col("raw").str.strip_chars_start().alias("ls"),
        col("raw").str.strip_chars_end().alias("rs"),
    )
    assert out.rows()[0] == ("abc", "abc  ", "  abc")
    df2 = frame(spark, "__key__")
    assert df2.select(col("raw").str.strip_chars("_").alias("s")).rows()[0][0] == "key"


def test_prefix_suffix(spark):
    df = frame(spark, "data.csv")
    out = df.select(
        col("raw").str.strip_suffix(".csv").alias("base"),
        col("raw").str.strip_prefix("data").alias("ext"),
        col("raw").str.starts_with("data").alias("sw"),
        col("raw").str.ends_with(".csv").alias("ew"),
    )
    assert out.rows()[0] == ("data", ".csv", True, True)


def test_contains_extract_replace(spark):
    df = frame(spark, "https://pl.rs")
    out = df.select(
        col("raw").str.contains("^https").alias("c"),
        col("raw").str.contains("pl.rs", literal=True).alias("cl"),
        col("raw").str.extract(r"https://(\w+)\.", 1).alias("e"),
        col("raw").str.replace_all(r"\w+\.rs", "X").alias("r"),
    )
    assert out.rows()[0] == (True, True, "pl", "https://X")


def test_extract_no_match_is_null(spark):
    df = frame(spark, "nope")
    assert df.select(col("raw").str.extract(r"(\d+)", 1).alias("e")).rows()[0][0] is None


def test_slice_negative_offset(spark):
    df = frame(spark, "hello")
    out = df.select(
        col("raw").str.slice(1, 3).alias("mid"),
        col("raw").str.slice(-3, 2).alias("tailish"),
        col("raw").str.slice(2).alias("rest"),
    )
    assert out.rows()[0] == ("ell", "ll", "llo")


def test_split(spark):
    df = frame(spark, "a,b,c")
    assert df.select(col("raw").str.split(",").alias("s")).rows()[0][0] == ["a", "b", "c"]


def test_to_date_strict_and_not(spark):
    df = frame(spark, "20250101")
    import datetime

    v = df.select(col("raw").str.to_date("%Y%m%d").alias("d")).rows()[0][0]
    assert v == datetime.date(2025, 1, 1)
    bad = frame(spark, "notadate")
    assert bad.select(col("raw").str.to_date("%Y%m%d").alias("d")).rows()[0][0] is None


def test_chained_strip_to_date(spark):
    # F7: "  2025-12-31  " strip → to_date
    import datetime

    df = frame(spark, "  2025-12-31  ")
    v = df.select(col("raw").str.strip_chars().str.to_date("%Y-%m-%d").alias("d")).rows()[0][0]
    assert v == datetime.date(2025, 12, 31)
