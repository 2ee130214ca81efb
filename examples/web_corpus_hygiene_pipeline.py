"""Web-corpus hygiene walkthrough with the round-8 operators: markup strip →
script triage → boilerplate-line removal → tokenizer-fertility budget →
exact-dup pressure → leakage-safe train/val/test split, then the
experimentation/causal layer (IPW ATE, power MDE, jackknife ratio CI,
Mann-Kendall trend) over the event log.

Run: python examples/web_corpus_hygiene_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import polars_net_spark as pl
from polars_net_spark.llm.dedup import strip_boilerplate_lines
from polars_net_spark.llm.splits import split_leakage_safe
from polars_net_spark.llm.text import (
    fertility_report,
    ngram_coverage,
    script_detect_frame,
    strip_markup_frame,
)
from polars_net_spark.operators.analytics import (
    dup_rate_by_key,
    quantile_compare,
    wasserstein_1d,
)
from polars_net_spark.operators.regression import (
    ipw_ate,
    jackknife_ratio_ci,
    mann_kendall,
    power_mde_report,
)


def main() -> None:
    pl.get_spark()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    docs = pl.scan_parquet(f"{sf_dir}/documents.parquet").spark
    events = pl.scan_parquet(f"{sf_dir}/events.parquet").spark

    # 1. web-crawl cleanup: strip markup, triage scripts, kill boilerplate
    clean = strip_markup_frame(docs).spark.drop("text").withColumnRenamed(
        "clean_text", "text"
    )
    scripts = script_detect_frame(clean)
    print("script mix:")
    scripts.spark.groupBy("dominant").count().show()

    stripped = strip_boilerplate_lines(clean, max_df_share=0.05)
    print("boilerplate removal:", stripped.spark.agg(
        F.sum("n_lines").alias("lines_in"), F.sum("n_kept").alias("lines_kept")
    ).collect()[0])

    # 2. corpus economics: tokenizer fertility + duplicate pressure
    fertility_report(docs, by="source").collect().show()
    dup_rate_by_key(docs, "text", "source").collect().show(5)

    # 3. leakage-safe split + decontamination QA between the halves
    split = split_leakage_safe(docs, salt="demo").spark
    split.groupBy("split").count().show()
    train = split.filter(F.col("split") == "train")
    test = split.filter(F.col("split") != "train")
    print("bigram leakage view:", ngram_coverage(train, test, n=2).collect().rows())

    # 4. experimentation layer over the event log
    daily = (
        events.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.datediff(F.to_date("ts"), F.lit("2020-01-01").cast("date"))
                 .cast("double").alias("t"))
        .agg(F.round(F.sum("value"), 6).alias("v"))
    )
    print("trend:", mann_kendall(daily, "t", "v").collect().rows())

    obs = events.filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    ).select(
        F.col("value").alias("y"),
        F.when(F.col("event_id") % 3 == 0, 1.0).otherwise(0.0).alias("treat"),
        (0.2 + 0.6 * (F.col("user_id") % 10) / 9.0).alias("p"),
    )
    print("IPW ATE:", ipw_ate(obs, "y", "treat", "p").collect().rows())
    power_mde_report(events, "value", by="event_type").collect().show()

    clicks = events.filter(F.col("value").isNotNull()).select(
        F.col("user_id").alias("u"),
        F.when(F.col("event_type") == "click", F.col("value")).otherwise(0.0)
        .alias("num"),
        F.lit(1.0).alias("den"),
    )
    print("cluster-robust CTR CI:",
          jackknife_ratio_ci(clicks, "num", "den", "u").collect().rows())

    # 5. drift pair: total (W1) + where (Q-Q)
    print("W1 click vs error:",
          wasserstein_1d(events, "value", "event_type", "click", "error")
          .collect().rows())
    quantile_compare(events, "value", "event_type", "click", "error")\
        .collect().show()


if __name__ == "__main__":
    main()
