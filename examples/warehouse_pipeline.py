"""Warehouse-maintenance walkthrough with the round-4 wave-2 operators:
SCD2 dimension versioning → Z-order fact layout → HLL distinct-count cube →
key-skew probe before the big join.

Run: python examples/warehouse_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import polars_net_spark as pl
from polars_net_spark.operators.merge import scd2_apply
from polars_net_spark.operators.regression import key_skew_report
from polars_net_spark.operators.sketches import (
    distinct_sketches,
    rollup_sketches,
    sketch_estimate,
)
from polars_net_spark.operators.zorder import zorder_sort


def main() -> None:
    pl.get_spark()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    cust = pl.scan_parquet(f"{sf_dir}/customer.parquet").spark
    li = pl.scan_parquet(f"{sf_dir}/lineitem.parquet").spark

    # 1. SCD2: fold an account-balance change batch into a versioned dim.
    hist = cust.select(
        F.col("c_custkey").alias("k"), F.round("c_acctbal", 2).alias("bal"),
        F.lit("2020-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"), F.lit(True).alias("is_current"),
    )
    batch = cust.filter(F.col("c_custkey") % 4 == 0).select(
        F.col("c_custkey").alias("k"),
        F.round(F.col("c_acctbal") + 50, 2).alias("bal"),
        F.lit("2024-06-01").cast("date").alias("ts"),
    )
    versioned = scd2_apply(hist, batch, "k", "bal", "ts")
    n_open = versioned.spark.filter("is_current").count()
    n_closed = versioned.spark.filter("NOT is_current").count()
    print(f"SCD2: {n_open} open rows, {n_closed} closed versions")

    # 2. Z-order the fact table for (orderkey, partkey) scan pruning.
    laid_out = zorder_sort(li, ["l_orderkey", "l_partkey"], bits=8)
    print(f"z-ordered rows: {laid_out.spark.count()}")

    # 3. HLL distinct cube: per-(returnflag, linestatus) sketches, rolled up.
    sk = distinct_sketches(li, "l_orderkey", by=["l_returnflag", "l_linestatus"])
    per = sketch_estimate(sk).spark.select("l_returnflag", "l_linestatus", "approx_distinct")
    print("distinct orders per (flag, status):")
    for r in per.orderBy("l_returnflag", "l_linestatus").collect():
        print(f"  {r[0]} {r[1]}: ~{r[2]}")
    grand = sketch_estimate(rollup_sketches(sk)).spark.collect()[0]["approx_distinct"]
    print(f"distinct orders total (sketch union, no re-scan): ~{grand}")

    # 4. Skew probe before joining on suppkey.
    print("hottest suppkeys:")
    for r in key_skew_report(li, "l_suppkey", top_k=3).collect().rows():
        print(f"  suppkey={r[0]} rows={r[1]} frac={r[2]}")


if __name__ == "__main__":
    main()
