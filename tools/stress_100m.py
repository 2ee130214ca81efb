"""Scale stress test — the analog of the reference's only quantitative
performance artifact (Polars.CSharp.Tests/StreamingTests.cs:209-272):
100,000,000 rows (Id: i64, Category: 2 distinct strings, Value: 1.0) →
filter(Category == 'Category_A') → aggregations, with closed-form expected
values asserted analytically:

    Count = N/2          Σ(Value·2) = N

The reference streams batches of 500k through its out-of-core engine; here the
source is a codegen'd range (no materialization) and Spark's pipelined
execution is the out-of-core engine.  Prints one JSON line with wall-clock and
rows/sec (which the reference printed but never recorded — we record).

Usage: python tools/stress_100m.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from polars_net_spark import get_spark


def main() -> None:
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000_000
    spark = get_spark(app_name="stress_100m")
    spark.range(1).count()  # warm

    t0 = time.time()
    df = (
        spark.range(n)
        .withColumn(
            "Category",
            F.when(F.col("id") % 2 == 0, F.lit("Category_A")).otherwise(F.lit("Category_B")),
        )
        .withColumn("Value", F.lit(1.0))
    )
    agg = (
        df.filter(F.col("Category") == "Category_A")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("Value") * 2).alias("sum2"),
            F.avg("Value").alias("avg_v"),
        )
        .collect()[0]
    )
    wall = time.time() - t0

    assert agg["cnt"] == n // 2, f"count {agg['cnt']} != {n // 2}"
    assert agg["sum2"] == float(n), f"sum {agg['sum2']} != {n}"
    assert agg["avg_v"] == 1.0

    print(
        json.dumps(
            {
                "metric": "stress_rows_per_sec",
                "value": round(n / wall),
                "unit": "rows/sec",
                "rows": n,
                "wall_sec": round(wall, 3),
                "invariants": {"count": agg["cnt"], "sum2": agg["sum2"]},
            }
        )
    )


if __name__ == "__main__":
    main()
