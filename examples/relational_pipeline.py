"""Relational analytics walkthrough — the reference README pipeline
(filter → group → sort, README.md:20-38) plus joins, windows, and SQL,
expressed in polars_net_spark.

Run: python examples/relational_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

import polars_net_spark as pl
from polars_net_spark import SQLContext, col, lit, when


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = pl.get_spark(app_name="example_relational")

    lineitem = pl.scan_parquet(f"{sf_dir}/lineitem.parquet")
    orders = pl.scan_parquet(f"{sf_dir}/orders.parquet")
    customer = pl.scan_parquet(f"{sf_dir}/customer.parquet")

    # filter → group → agg → sort (the reference's README pipeline shape)
    summary = (
        lineitem.filter(col("l_quantity") > 10)
        .group_by("l_returnflag")
        .agg(
            (col("l_extendedprice") * (1 - col("l_discount"))).sum().round(2).alias("revenue"),
            col("l_quantity").mean().round(2).alias("avg_qty"),
        )
        .sort("revenue", descending=True)
        .collect()
    )
    print("revenue by return flag:")
    summary.show()

    # join with polars naming semantics + conditional bucketing
    enriched = (
        orders.join(customer, left_on="o_custkey", right_on="c_custkey", how="left")
        .with_columns(
            when(col("o_totalprice") > 200000).then(lit("big")).otherwise(lit("small")).alias("size")
        )
        .group_by("c_mktsegment", "size")
        .agg(col("o_orderkey").len().alias("n"))
        .sort(["c_mktsegment", "size"])
        .collect()
    )
    print("orders by segment and size:")
    enriched.show()

    # window: each customer's running spend
    running = orders.select(
        col("o_custkey"),
        col("o_orderdate"),
        col("o_totalprice")
        .cum_sum(order_by=[col("o_orderdate"), col("o_orderkey")], partition_by=["o_custkey"])
        .round(2)
        .alias("lifetime_spend"),
    ).collect()
    print("running spend sample:")
    running.head(5).show()

    # SQL over the same frames
    ctx = SQLContext(spark, li=lineitem, o=orders)
    top = ctx.execute(
        """
        SELECT o_orderpriority, round(avg(o_totalprice), 2) AS avg_price
        FROM o GROUP BY o_orderpriority ORDER BY avg_price DESC LIMIT 3
        """
    ).collect()
    print("top priorities by avg price:")
    top.show()


if __name__ == "__main__":
    main()
