"""to_dummies + Series positional kernels (polars parity extras)."""

import pytest

import polars_net_spark as pl


class TestToDummies:
    @pytest.fixture(scope="class")
    def frame(self, spark):
        return pl.from_records(
            [(1, "a", "x"), (2, "b", "y"), (3, "a", None), (4, "c", "x")],
            ["id", "cat", "tag"],
        ).lazy()

    def test_basic(self, frame):
        out = frame.to_dummies("cat").sort("id").collect()
        assert out.columns == ["id", "cat_a", "cat_b", "cat_c", "tag"]
        rows = out.rows()
        assert [r[1] for r in rows] == [1, 0, 1, 0]
        assert [r[2] for r in rows] == [0, 1, 0, 0]

    def test_null_column(self, frame):
        out = frame.to_dummies("tag").sort("id").collect()
        assert out.columns == ["id", "cat", "tag_x", "tag_y", "tag_null"]
        assert [r[4] for r in out.rows()] == [0, 0, 1, 0]

    def test_multi_and_separator(self, frame):
        out = frame.to_dummies("cat", "tag", separator="|").collect()
        assert "cat|a" in out.columns and "tag|null" in out.columns
        assert "cat" not in out.columns and "tag" not in out.columns

    def test_drop_first(self, frame):
        out = frame.to_dummies("cat", drop_first=True).collect()
        assert out.columns == ["id", "cat_b", "cat_c", "tag"]

    def test_eager(self, frame):
        out = frame.collect().to_dummies("cat")
        assert "cat_a" in out.columns


class TestSeriesPositional:
    def test_arg_max_min(self, spark):
        s = pl.Series("x", [3.0, None, 9.0, 9.0, 1.0])
        assert s.arg_max() == 2  # first occurrence on tie
        assert s.arg_min() == 4

    def test_arg_max_all_null(self, spark):
        s = pl.Series("x", [None, None], dtype="f64")
        assert s.arg_max() is None and s.arg_min() is None

    def test_arg_sort(self, spark):
        s = pl.Series("x", [30, 10, 20])
        assert s.arg_sort().to_list() == [1, 2, 0]
        assert s.arg_sort(descending=True).to_list() == [0, 2, 1]

    def test_arg_sort_nulls(self, spark):
        s = pl.Series("x", [None, 2, 1])
        assert s.arg_sort().to_list() == [0, 2, 1]  # nulls first (polars default)
        assert s.arg_sort(nulls_last=True).to_list() == [2, 1, 0]

    def test_search_sorted(self, spark):
        s = pl.Series("x", [1, 3, 3, 5])
        assert s.search_sorted(3) == 1
        assert s.search_sorted(3, side="right") == 3
        assert s.search_sorted(0) == 0
        assert s.search_sorted(9) == 4
        with pytest.raises(ValueError):
            s.search_sorted(3, side="middle")

    def test_unique_counts(self, spark):
        s = pl.Series("x", ["b", "a", "b", "c", "b", "a"])
        assert s.unique_counts().to_list() == [3, 2, 1]  # first-appearance order


class TestSeriesStatsConstructors:
    def test_series_stats(self, spark):
        s = pl.Series("x", [1.0, 2.0, 2.0, 3.0])
        assert s.median() == 2.0
        assert s.n_unique() == 3
        assert s.mode() == 2.0
        assert round(s.std() ** 2, 9) == round(s.var(), 9)
        assert s.var(ddof=0) == pytest.approx(0.5)
        vc = s.value_counts().rows()
        assert vc[0] == (2.0, 2)

    def test_mode_tie_smallest(self, spark):
        assert pl.Series("x", [3, 1, 3, 1, 2]).mode() == 1

    def test_from_dict_and_dicts(self, spark):
        df = pl.from_dict({"a": [1, 2], "b": ["x", "y"]})
        assert df.columns == ["a", "b"] and df.height == 2
        df2 = pl.from_dicts([{"a": 1, "b": "x"}, {"a": 2}])
        rows = df2.sort("a").rows()
        assert rows[1][1] is None or rows[1][1] != rows[1][1]  # missing -> null/NaN
        import pytest as _pt

        with _pt.raises(ValueError):
            pl.from_dict({"a": [1], "b": [1, 2]})
        with _pt.raises(ValueError):
            pl.from_dicts([])
