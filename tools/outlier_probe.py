"""Diagnose the four un-annotated BENCH_SF10 100x outliers (r10 verdict #2):
measure the actual cost drivers (candidate-join volume, output rows, window
parallelism) at sf0.1 / sf1 / sf10 so each note says compute-linear vs
densification from data, not guesswork.

Writes OUTLIER_DIAG_r11.json.

Usage: python tools/outlier_probe.py [sf_tag ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

SCALES = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/root/repo/.scratch/sf1.0",
    "sf10": "/root/repo/.scratch/sf10",
}


def main() -> None:
    tags = sys.argv[1:] or list(SCALES)
    from polars_net_spark import get_spark, release_caches
    from polars_net_spark.llm.dedup import _grams_frame

    spark = get_spark(app_name="outlier_probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for tag in tags:
        sf = SCALES[tag]
        row: dict = {}
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        grams = _grams_frame(docs, "text", "doc_id", 3, hash_grams=True)
        exploded = grams.select("id", F.explode("grams").alias("gram"))
        df_tbl = exploded.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
        t0 = time.time()
        m = df_tbl.agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.col("df") * F.col("df")).alias("sum_df2"),
            F.max("df").alias("max_df"),
        ).collect()[0]
        row["n_docs"] = docs.count()
        row["distinct_grams"] = int(m["n_grams"])
        # Sum df^2 IS the inverted-index self-join row count (q30/q212
        # candidate stage) before the size filter
        row["postings_join_rows_sum_df2"] = int(m["sum_df2"])
        row["max_gram_df"] = int(m["max_df"])
        row["gram_stats_sec"] = round(time.time() - t0, 1)
        release_caches()

        # q30 output pairs (the verified near-dup pairs)
        from polars_net_spark.llm import ngram_jaccard_pairs

        t0 = time.time()
        row["q30_pairs"] = ngram_jaccard_pairs(docs, n=3, threshold=0.5).spark.count()
        row["q30_pairs_sec"] = round(time.time() - t0, 1)
        release_caches()

        # q197 prefix-postings join volume: sum over grams of
        # (lhs prefix df) x (rhs full df) — the containment candidate stage
        g = F.size("grams")
        lex_len = (g - F.ceil(F.lit(0.8) * g) + 1).cast("int")
        lhs = grams.select(
            F.explode(F.slice(F.array_sort("grams"), F.lit(1), lex_len)).alias("gram")
        ).groupBy("gram").agg(F.count(F.lit(1)).alias("pdf"))
        t0 = time.time()
        jm = lhs.join(df_tbl, "gram").agg(
            F.sum(F.col("pdf") * F.col("df")).alias("join_rows")
        ).collect()[0]
        row["q197_prefix_join_rows"] = int(jm["join_rows"])
        row["q197_probe_sec"] = round(time.time() - t0, 1)
        release_caches()

        # q116: window parallelism = distinct partition keys; cell-table
        # size = distinct (flag, quantity) — the lever's working set
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        row["q116_rows"] = li.count()
        row["q116_partition_keys"] = li.select("l_returnflag").distinct().count()
        row["q116_cells"] = (
            li.select("l_returnflag", "l_quantity").distinct().count()
        )
        out[tag] = row
        print(tag, json.dumps(row), flush=True)

    json.dump(out, open("/root/repo/OUTLIER_DIAG_r11.json", "w"), indent=1)
    print("wrote OUTLIER_DIAG_r11.json")


if __name__ == "__main__":
    main()
