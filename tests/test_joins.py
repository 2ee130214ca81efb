"""Joins incl. as-of (FIXTURES F2, F10; oracle ComplexTests.fs:475-533)."""

import polars_net_spark as pl
from polars_net_spark import col


def frames(spark):
    a = pl.from_records([(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)], ["k", "tag", "val"])
    b = pl.from_records([(1, "p", 7.0), (2, "q", 8.0), (4, "r", 9.0)], ["k", "tag", "score"])
    return a, b


def test_inner_left_full(spark):
    a, b = frames(spark)
    inner = a.join(b, on="k", how="inner")
    assert inner.columns == ["k", "tag", "val", "tag_right", "score"]
    assert inner.height == 2
    left = a.join(b, on="k", how="left").sort("k")
    assert left.height == 3
    assert left.rows()[2][3] is None  # k=3 unmatched
    full = a.join(b, on="k", how="full")
    assert full.height == 4
    ks = sorted(r[0] for r in full.rows())
    assert ks == [1, 2, 3, 4]  # key coalesced on full join


def test_semi_anti_cross(spark):
    a, b = frames(spark)
    assert a.join(b, on="k", how="semi").height == 2
    assert a.join(b, on="k", how="anti").height == 1
    cross = a.join(b, how="cross")
    assert cross.height == 9
    assert cross.columns == ["k", "tag", "val", "k_right", "tag_right", "score"]


def test_multi_key_left_right_on(spark):
    a = pl.from_records([("x", 1, 10.0), ("y", 2, 20.0)], ["k1", "k2", "v"])
    b = pl.from_records([("x", 1, "m1"), ("y", 9, "m2")], ["j1", "j2", "m"])
    out = a.join(b, left_on=["k1", "k2"], right_on=["j1", "j2"], how="inner")
    assert out.height == 1
    assert out.rows()[0][3] == "m1"


def test_asof_backward_tolerance(spark):
    # FIXTURES F2 exact oracle
    trades = pl.from_records(
        [(1000, "AAPL", 10), (1000, "MSFT", 20), (1005, "AAPL", 10)],
        ["time", "ticker", "volume"],
    )
    quotes = pl.from_records(
        [(998, "MSFT", 50.0), (999, "AAPL", 99.0), (1001, "AAPL", 101.0)],
        ["time", "ticker", "bid"],
    )
    out = trades.join_asof(quotes, on="time", by="ticker", strategy="backward", tolerance=2)
    d = {(r[0], r[1]): r[3] for r in out.rows()}
    assert d[(1000, "AAPL")] == 99.0
    assert d[(1000, "MSFT")] == 50.0
    assert d[(1005, "AAPL")] is None


def test_asof_forward_nearest(spark):
    left = pl.from_records([(5,), (15,)], ["t"])
    right = pl.from_records([(0, "a"), (10, "b"), (20, "c")], ["t", "v"])
    fwd = left.join_asof(right, on="t", strategy="forward")
    assert {r[0]: r[1] for r in fwd.rows()} == {5: "b", 15: "c"}
    near_l = pl.from_records([(4,), (16,)], ["t"])
    near = near_l.join_asof(right, on="t", strategy="nearest")
    assert {r[0]: r[1] for r in near.rows()} == {4: "a", 16: "c"}


def test_asof_exact_match_and_alloweq(spark):
    left = pl.from_records([(10,)], ["t"])
    right = pl.from_records([(10, "exact"), (5, "before")], ["t", "v"])
    eq = left.join_asof(right, on="t", strategy="backward")
    assert eq.rows()[0][1] == "exact"
    neq = left.join_asof(right, on="t", strategy="backward", allow_exact_matches=False)
    assert neq.rows()[0][1] == "before"


def test_join_broadcast_hint(spark):
    a, b = frames(spark)
    out = a.join(b, on="k", how="inner", broadcast=True)
    assert out.height == 2
    plan = out.lazy()._sdf._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


class TestNullsEqualJoin:
    def test_null_keys_match(self, spark):
        import polars_net_spark as pl

        a = pl.from_records([(None, "l1"), (1, "l2"), (2, "l3")], ["k", "a"]).lazy()
        b = pl.from_records([(None, "r1"), (1, "r2")], ["k", "b"]).lazy()
        ne = sorted(a.join(b, on="k", nulls_equal=True).collect().rows(), key=str)
        assert ne == [(1, "l2", "r2"), (None, "l1", "r1")]
        default = a.join(b, on="k").collect().rows()
        assert default == [(1, "l2", "r2")]  # null keys never match by default

    def test_still_hash_joinable(self, spark):
        import polars_net_spark as pl

        a = pl.from_records([(None, "x"), (1, "w")], ["k", "a"]).lazy()
        b = pl.from_records([(None, "y"), (2, "z")], ["k", "b"]).lazy()
        plan = a.join(b, on="k", nulls_equal=True)._sdf._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_join_on_expressions(spark):
    """polars left_on/right_on accept expressions — materialized as hidden
    equi-key columns so the join stays hash-joinable."""
    import polars_net_spark as pl
    from polars_net_spark import col

    a = pl.from_records([(1, "a"), (2, "b")], ["k", "va"]).lazy()
    b = pl.from_records([(10, "X"), (20, "Y")], ["k10", "vb"]).lazy()
    out = sorted(a.join(b, left_on=col("k") * 10, right_on="k10").collect().rows())
    assert out == [(1, "a", "X"), (2, "b", "Y")]
    # polars discards right key columns on equi joins (coalesce default) —
    # the expression left key changes nothing about the naming rule
    assert a.join(b, left_on=col("k") * 10, right_on="k10").collect().columns == ["k", "va", "vb"]
    both = sorted(
        a.join(b, left_on=[col("k") * 10], right_on=[col("k10") * 1]).collect().rows()
    )
    assert [r[:2] for r in both] == [(1, "a"), (2, "b")]


def test_join_validate(spark):
    import pytest

    import polars_net_spark as pl

    a = pl.from_records([(1, "x"), (2, "y")], ["k", "va"]).lazy()
    dup = pl.from_records([(1, "p"), (1, "q")], ["k", "vb"]).lazy()
    # m:1 requires a UNIQUE right side -> raises
    with pytest.raises(ValueError, match="right side has duplicate"):
        a.join(dup, on="k", validate="m:1")
    with pytest.raises(ValueError, match="left side has duplicate"):
        dup.join(a, on="k", validate="1:m")
    # satisfied contract passes through
    out = a.join(dup, on="k", validate="1:m").collect().rows()
    assert sorted(out) == [(1, "x", "p"), (1, "x", "q")]
    with pytest.raises(ValueError, match="validate must be"):
        a.join(dup, on="k", validate="nope")


def test_join_coalesce_false_keeps_right_keys(spark):
    import polars_net_spark as pl

    a = pl.from_records([(1, "x")], ["k", "va"]).lazy()
    b = pl.from_records([(1, "y")], ["k", "vb"]).lazy()
    out = a.join(b, on="k", coalesce=False).collect()
    assert out.columns == ["k", "va", "k_right", "vb"]
    assert out.rows() == [(1, "x", 1, "y")]
    # different key names: right key kept under its own name
    c = pl.from_records([(1, "z")], ["k2", "vc"]).lazy()
    out2 = a.join(c, left_on="k", right_on="k2", coalesce=False).collect()
    assert out2.columns == ["k", "va", "k2", "vc"]
