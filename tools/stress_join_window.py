"""Join + window scale stress with closed-form invariants.

Complements stress_100m.py (agg-only): exercises the two other
shuffle-shaped paths at scale —

- broadcast hash join: 50M-row fact × 1M-row dim (dim broadcast, fact never
  shuffled), Σ(v·w) = 2·N exactly
- keyed window: running sum over 50k partitions of 1k rows each;
  Σ(running_last) = Σ per-partition totals = N exactly

Usage: python tools/stress_join_window.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from polars_net_spark import get_spark


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 50_000_000
    n_keys = 1_000_000
    n_parts = 50_000
    spark = get_spark(app_name="stress_join_window")
    spark.range(1).count()

    fact = (
        spark.range(n)
        .withColumn("key", F.col("id") % n_keys)
        .withColumn("wkey", F.col("id") % n_parts)
        .withColumn("v", F.lit(1.0))
    )
    dim = spark.range(n_keys).select(F.col("id").alias("key"), F.lit(2.0).alias("w"))

    t0 = time.time()
    joined = fact.join(F.broadcast(dim), "key")
    agg = joined.agg(F.sum(F.col("v") * F.col("w")).alias("s")).collect()[0]
    join_wall = time.time() - t0
    assert agg["s"] == 2.0 * n, f"join invariant failed: {agg['s']}"

    t0 = time.time()
    w = Window.partitionBy("wkey").orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    run = fact.withColumn("rs", F.sum("v").over(w))
    # the last running value per partition equals the partition size;
    # summing max(rs) over partitions must give N exactly
    total = run.groupBy("wkey").agg(F.max("rs").alias("m")).agg(F.sum("m")).collect()[0][0]
    window_wall = time.time() - t0
    assert total == float(n), f"window invariant failed: {total}"

    print(
        json.dumps(
            {
                "metric": "stress_join_window",
                "rows": n,
                "join_rows_per_sec": round(n / join_wall),
                "window_rows_per_sec": round(n / window_wall),
                "join_wall_sec": round(join_wall, 3),
                "window_wall_sec": round(window_wall, 3),
                "invariants_ok": True,
            }
        )
    )


if __name__ == "__main__":
    main()
