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
