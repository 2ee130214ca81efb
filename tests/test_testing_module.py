"""pl.testing.assert_frame_equal / assert_series_equal."""

import pytest

import polars_net_spark as pl
from polars_net_spark.testing import assert_frame_equal, assert_series_equal


def test_frame_equal_basics(spark):
    a = pl.from_records([(1, "x"), (2, "y")], ["i", "s"]).lazy()
    b = pl.from_records([(2, "y"), (1, "x")], ["i", "s"]).lazy()
    assert_frame_equal(a, a)
    assert_frame_equal(a, b, check_row_order=False)
    with pytest.raises(AssertionError):
        assert_frame_equal(a, b)  # order-sensitive by default
    c = pl.from_records([(1, "x")], ["i", "s"]).lazy()
    with pytest.raises(AssertionError, match="height"):
        assert_frame_equal(a, c)


def test_frame_equal_float_tolerance_and_columns(spark):
    a = pl.from_records([(1.0,)], ["v"]).lazy()
    b = pl.from_records([(1.0 + 1e-9,)], ["v"]).lazy()
    assert_frame_equal(a, b)
    d = pl.from_records([(1, 2)], ["x", "y"]).lazy()
    e = d.select(pl.col("y"), pl.col("x"))
    with pytest.raises(AssertionError, match="column order"):
        assert_frame_equal(d, e)
    assert_frame_equal(d, e, check_column_order=False)


def test_series_equal(spark):
    s1 = pl.Series("s", [1.0, None, 3.0])
    s2 = pl.Series("s", [1.0, None, 3.0 + 1e-9])
    assert_series_equal(s1, s2)
    with pytest.raises(AssertionError):
        assert_series_equal(s1, pl.Series("s", [1.0, None, 4.0]))
