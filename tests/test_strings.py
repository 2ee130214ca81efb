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


def test_pad_zfill(spark):
    import polars_net_spark as pl
    from polars_net_spark import col

    df = pl.from_records([("7",), ("-7",), ("+123456",), ("abc",)], ["s"])
    out = df.select(
        col("s").str.zfill(5).alias("z"),
        col("s").str.pad_start(5, "_").alias("ps"),
        col("s").str.pad_end(5, "_").alias("pe"),
    )
    rows = out.rows()
    assert [r[0] for r in rows] == ["00007", "-0007", "+123456", "00abc"]
    assert [r[1] for r in rows] == ["____7", "___-7", "+123456", "__abc"]
    assert [r[2] for r in rows] == ["7____", "-7___", "+123456", "abc__"]


def test_extract_groups_and_splitn(spark):
    import polars_net_spark as pl
    from polars_net_spark import col

    df = pl.from_records([("john:42",), ("nope",)], ["s"])
    out = df.select(
        col("s").str.extract_groups(r"(?P<name>\w+):(?P<age>\d+)").alias("g"),
        col("s").str.splitn(":", 3).alias("p"),
    )
    rows = [r.asDict(recursive=True) for r in out.spark.collect()]
    assert rows[0]["g"] == {"name": "john", "age": "42"}
    assert rows[1]["g"] == {"name": None, "age": None}
    assert rows[0]["p"] == {"field_0": "john", "field_1": "42", "field_2": None}


def test_dt_extras(spark):
    import datetime as dt

    import polars_net_spark as pl
    from polars_net_spark import col

    # 2021-01-01 is ISO week 53 of ISO year 2020; 2024 is a leap year
    df = pl.from_records(
        [(dt.datetime(2021, 1, 1),), (dt.datetime(2024, 2, 10),)], ["ts"]
    )
    out = df.select(
        col("ts").dt.quarter().alias("q"),
        col("ts").dt.week().alias("w"),
        col("ts").dt.iso_year().alias("iy"),
        col("ts").dt.is_leap_year().alias("leap"),
        col("ts").dt.days_in_month().alias("dim"),
    )
    rows = out.rows()
    assert rows[0] == (1, 53, 2020, False, 31)
    assert rows[1] == (1, 6, 2024, True, 29)


class TestBinNamespace:
    """polars Expr.bin (exprs.py ExprBinNamespace) — parity extra."""

    def test_roundtrip_and_predicates(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        df = pl.from_records([(1, b"hello"), (2, b"\x00\xff"), (3, None)], ["id", "b"])
        out = df.select(
            col("id"),
            col("b").bin.encode("hex").alias("h"),
            col("b").bin.encode("base64").alias("b64"),
            col("b").bin.size().alias("n"),
            col("b").bin.contains(b"ell").alias("c"),
            col("b").bin.starts_with(b"he").alias("s"),
            col("b").bin.ends_with(b"\xff").alias("e"),
            col("b").bin.encode("hex").bin.decode("hex").alias("rt"),
            col("b").bin.encode("base64").bin.decode("base64").alias("rt64"),
        ).sort("id").rows()
        assert out[0][1] == "68656c6c6f" and out[0][2] == "aGVsbG8="
        assert out[0][3] == 5 and out[0][4] is True and out[0][5] is True and out[0][6] is False
        assert out[0][7] == b"hello" and out[0][8] == b"hello"
        assert out[1][1] == "00ff" and out[1][6] is True
        assert out[2][1] is None and out[2][3] is None

    def test_decode_invalid_is_null(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        df = pl.from_records([(1, "zz-not-hex")], ["id", "s"])
        assert df.select(col("s").bin.decode("hex").alias("d")).rows()[0][0] is None

    def test_bad_encoding(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col
        import pytest as _pt

        df = pl.from_records([(1, b"x")], ["id", "b"])
        with _pt.raises(ValueError):
            df.select(col("b").bin.encode("utf16"))
        with _pt.raises(ValueError):
            df.select(col("b").bin.decode("rot13"))


class TestStrMatchExtras:
    def test_extract_all_count_find(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        df = pl.from_records([(1, "the cat and the hat"), (2, "no match here"), (3, None)], ["id", "s"])
        out = df.select(
            col("id"),
            col("s").str.extract_all(r"the \w+").alias("m"),
            col("s").str.count_matches("the", literal=True).alias("n"),
            col("s").str.find("hat", literal=True).alias("f"),
            col("s").str.find(r"h\w+", literal=False).alias("fr"),
        ).sort("id").rows()
        assert list(out[0][1]) == ["the cat", "the hat"]
        assert out[0][2] == 2 and out[0][3] == 16
        assert out[0][4] == 1  # first h\w+ is "he" inside the leading "the"
        assert list(out[1][1]) == [] and out[1][2] == 0 and out[1][3] is None
        assert out[2][1] is None and out[2][3] is None


class TestStrHeadTailNullsafe:
    def test_head_tail(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        df = pl.LazyFrame(spark.createDataFrame(
            [(1, "abcdef"), (2, "ab"), (3, None)], "id long, s string"))
        out = df.select(
            col("id"),
            col("s").str.head(3).alias("h3"),
            col("s").str.head(-2).alias("hm2"),
            col("s").str.tail(2).alias("t2"),
            col("s").str.tail(-4).alias("tm4"),
            col("s").str.tail(0).alias("t0"),
        ).sort("id").collect().rows()
        assert out[0][1:] == ("abc", "abcd", "ef", "ef", "")
        assert out[1][1:] == ("ab", "", "ab", "", "")
        assert out[2][1:] == (None, None, None, None, None)

    def test_eq_ne_missing(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        df = pl.LazyFrame(spark.createDataFrame(
            [(1, "a", "a"), (2, "a", None), (3, None, None)], "id long, x string, y string"))
        out = df.select(
            col("id"),
            col("x").eq_missing(col("y")).alias("em"),
            col("x").ne_missing(col("y")).alias("nm"),
        ).sort("id").collect().rows()
        assert [(r[1], r[2]) for r in out] == [(True, False), (False, True), (True, False)]


class TestContainsReplaceMany:
    def test_contains_any(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        df = pl.from_records([(1, "big data day"), (2, "nothing here"), (3, "MODEL x")], ["id", "s"])
        out = df.select(
            col("id"),
            col("s").str.contains_any(["data", "model"]).alias("h"),
            col("s").str.contains_any(["data", "model"], ascii_case_insensitive=True).alias("hi"),
        ).sort("id").rows()
        assert [r[1] for r in out] == [True, False, False]
        assert [r[2] for r in out] == [True, False, True]

    def test_replace_many(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col
        import pytest as _pt

        df = pl.from_records([(1, "ab abc ab")], ["id", "s"])
        one = df.select(col("s").str.replace_many(["ab", "abc"], "X").alias("r")).rows()[0][0]
        assert one == "X X X"  # longest-first: abc wins over ab
        per = df.select(
            col("s").str.replace_many(["ab", "abc"], ["1", "2"]).alias("r")
        ).rows()[0][0]
        assert per == "1 2 1"
        with _pt.raises(ValueError):
            df.select(col("s").str.replace_many([], "x"))
        with _pt.raises(ValueError):
            df.select(col("s").str.replace_many(["a", "b"], ["only-one"]))

    def test_replace_many_literal_replacement(self, spark):
        """'$' and '\\' in replacements are literals (polars), not group
        refs / escapes for the underlying regexp_replace (round-3 advice)."""
        import polars_net_spark as pl
        from polars_net_spark import col

        df = pl.from_records([(1, "price X and Y")], ["id", "s"])
        one = df.select(col("s").str.replace_many(["X"], "$10").alias("r")).rows()[0][0]
        assert one == "price $10 and Y"
        per = df.select(
            col("s").str.replace_many(["X", "Y"], ["$1", "a\\b"]).alias("r")
        ).rows()[0][0]
        assert per == "price $1 and a\\b"


class TestStrExtrasR4:
    def test_split_exact_titlecase_reverse(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        d = pl.from_records([(1, "a-b-c")], ["i", "s"]).lazy()
        row = d.select(
            col("s").str.split_exact("-", 1).alias("se"),
            col("s").str.to_titlecase().alias("tc"),
            col("s").str.reverse().alias("rv"),
        ).collect().rows()[0]
        assert row[0] == ("a", "b-c")  # n splits -> n+1 fields, rest in last
        assert row[1] == "A-b-c" and row[2] == "c-b-a"

    def test_to_integer(self, spark):
        import polars_net_spark as pl
        from polars_net_spark import col

        d = pl.from_records([("ff",), ("10",)], ["h"]).lazy()
        assert [r[0] for r in d.select(col("h").str.to_integer(16).alias("v")).collect().rows()] == [255, 16]
        bad = pl.from_records([("xyz",)], ["h"]).lazy()
        assert bad.select(col("h").str.to_integer(strict=False).alias("v")).collect().rows() == [(None,)]
        import pytest as _pt

        with _pt.raises(Exception):
            bad.select(col("h").str.to_integer().alias("v")).collect().rows()


def test_extract_many(spark):
    import polars_net_spark as pl
    from polars_net_spark import col

    d = pl.from_records([(1, "the cat and the cattle"), (2, None)], ["i", "s"]).lazy()
    rows = d.select(col("i"), col("s").str.extract_many(["cat", "cattle", "the"]).alias("m")).sort("i").collect().rows()
    assert list(rows[0][1]) == ["the", "cat", "the", "cattle"]  # longest-first on overlap
    assert rows[1][1] is None
    ci = d.select(col("s").str.extract_many(["THE"], ascii_case_insensitive=True).alias("m")).collect().rows()[0][0]
    assert list(ci) == ["the", "the"]
    import pytest as _pt

    with _pt.raises(ValueError):
        col("s").str.extract_many([])
    with _pt.raises(NotImplementedError):
        col("s").str.extract_many(["x"], overlapping=True)
