"""Error propagation & edge cases (reference SafetyTests.fs, UDFTests error
paths, LazyFrameTests concat safety)."""

import pytest

import polars_net_spark as pl
from polars_net_spark import col


def test_invalid_column_raises(people):
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        people.select(col("no_such_column")).rows()


def test_invalid_join_key_raises(people, spark):
    from pyspark.errors.exceptions.captured import AnalysisException

    other = pl.from_records([(1,)], ["k"])
    with pytest.raises(AnalysisException):
        people.join(other, on="missing_key").rows()


def test_bad_sort_flags_raise(people):
    with pytest.raises(ValueError):
        people.sort(["age", "salary"], descending=[True])


def test_unknown_how_raises(people, spark):
    other = pl.from_records([(1,)], ["k"])
    with pytest.raises(KeyError):
        people.join(other, on="k", how="sideways")


def test_unknown_dtype_raises(people):
    with pytest.raises(ValueError):
        people.select(col("age").cast("quaternion"))


def test_left_right_on_length_mismatch(people, spark):
    other = pl.from_records([(1, 2)], ["a", "b"])
    with pytest.raises(ValueError):
        people.join(other, left_on=["age"], right_on=["a", "b"])


def test_pivot_unknown_agg(spark):
    df = pl.from_records([("a", "m", 1.0)], ["id", "k", "v"])
    with pytest.raises(ValueError):
        df.pivot("id", "k", "v", "geometric_mean")


def test_quantile_unknown_interpolation(people):
    with pytest.raises(ValueError):
        people.select(col("age").quantile(0.5, "cubic")).rows()


def test_empty_frame_ops(spark):
    df = pl.from_records([(1, "a")], ["x", "y"]).filter(col("x") > 99)
    assert df.height == 0
    assert df.select(col("x").sum().alias("s")).rows()[0][0] is None
    assert df.lazy().group_by("y").agg(col("x").sum().alias("s")).collect().height == 0


def test_join_all_null_keys(spark):
    # null keys never match (SQL semantics, same as polars)
    a = pl.from_records([(None, 1), (1, 2)], ["k", "va"])
    b = pl.from_records([(None, 10), (1, 20)], ["k", "vb"])
    out = a.join(b, on="k", how="inner")
    assert out.height == 1
    left = a.join(b, on="k", how="left").sort("va")
    assert left.rows()[0][2] is None  # null key row unmatched


def test_duration_parse_errors(spark):
    from polars_net_spark._fmt import parse_polars_duration_us

    with pytest.raises(ValueError):
        parse_polars_duration_us("3x")
    with pytest.raises(ValueError):
        parse_polars_duration_us("1mo")  # calendar unit
    assert parse_polars_duration_us("1h30m") == 5_400_000_000


def test_strftime_unknown_directive(spark):
    from polars_net_spark._fmt import strftime_to_java

    with pytest.raises(ValueError):
        strftime_to_java("%Q")
    assert strftime_to_java("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"
    assert strftime_to_java("%%") == "%"


def test_udf_decimal_roundtrip(spark):
    df = pl.from_records([("1.50",), ("2.25",)], ["raw"])
    out = df.select(col("raw").cast("decimal(10,2)").alias("d"))
    from decimal import Decimal

    assert [r[0] for r in out.rows()] == [Decimal("1.50"), Decimal("2.25")]


def test_series_series_arithmetic(spark):
    from polars_net_spark import Series

    a = Series("a", [1.0, 2.0, 3.0])
    b = Series("b", [10.0, 20.0, 30.0])
    s = a + b
    assert s.to_list() == [11.0, 22.0, 33.0]
