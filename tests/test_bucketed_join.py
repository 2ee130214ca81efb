"""Bucketed-table co-located join: the write_bucketed path must let a join on
the bucket key run with NO shuffle exchange on either side — the repeated
big-big-join lever at 100 TB."""

import polars_net_spark as pl


def test_bucketed_join_has_no_shuffle(spark):
    s = pl.get_spark()
    facts = pl.from_records(
        [(i % 100, i, float(i) * 1.5) for i in range(2000)], ["k", "seq", "amount"]
    ).lazy()
    dims = pl.from_records(
        [(i, f"name{i}") for i in range(100)], ["k", "name"]
    ).lazy()
    try:
        facts.write_bucketed("t_facts", bucket_by=["k"], num_buckets=8, sort_by=["k"])
        dims.write_bucketed("t_dims", bucket_by=["k"], num_buckets=8, sort_by=["k"])

        left = s.table("t_facts")
        right = s.table("t_dims")
        joined = left.hint("merge").join(right, on="k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # bucketing replaces both shuffles: no hash-partition exchange at all
        assert "Exchange hashpartitioning" not in plan

        # and the result is the plain join's result
        got = sorted(tuple(r) for r in joined.collect())
        exp = sorted(
            tuple(r)
            for r in facts._sdf.join(dims._sdf, on="k").collect()
        )
        assert got == exp
    finally:
        s.sql("DROP TABLE IF EXISTS t_facts")
        s.sql("DROP TABLE IF EXISTS t_dims")


def test_bucketed_agg_has_no_shuffle(spark):
    s = pl.get_spark()
    facts = pl.from_records(
        [(i % 50, float(i)) for i in range(1000)], ["k", "v"]
    ).lazy()
    try:
        facts.write_bucketed("t_agg", bucket_by=["k"], num_buckets=4)
        import pyspark.sql.functions as F

        agg = s.table("t_agg").groupBy("k").agg(F.sum("v").alias("s"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert agg.count() == 50
    finally:
        s.sql("DROP TABLE IF EXISTS t_agg")
