"""Corpus-health + experimentation walkthrough with the round-7 operators:
cheap sketches for the scale questions (how many distinct? how frequent?),
structural probes (duplicate mass, power-law shape), snapshot drift between
two crawls, robust outlier screening, and an always-valid sequential test —
ending in a DP-style publishable histogram.

Everything is deterministic (md5-seeded draws, fixed iteration counts), so
reruns and engine ports produce identical reports — the property every gate
in __spark_entry__.py hash-checks against DuckDB.

Run: python examples/corpus_health_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import polars_net_spark as pl
from polars_net_spark.llm import dedup_cluster_stats, zipf_fit
from polars_net_spark.operators.analytics import dp_count_report, mad_outliers
from polars_net_spark.operators.describe import profile_diff
from polars_net_spark.operators.regression import anova_oneway, msprt_report
from polars_net_spark.operators.sketches import cms_build, cms_query, kmv_distinct


def main() -> None:
    spark = pl.get_spark()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    docs = pl.scan_parquet(f"{sf_dir}/documents.parquet")
    events = pl.scan_parquet(f"{sf_dir}/events.parquet")

    # 1. Scale questions first — sketches, not scans of raw values.
    print("== cardinality (KMV, deterministic) ==")
    kmv_distinct(events, "user_id", k=256).collect().show()

    print("== event-type frequency estimates (count-min) ==")
    sk = cms_build(events, "event_type", depth=3, width=256)
    probes = events.spark.select("event_type").distinct()
    cms_query(sk, probes, "event_type", depth=3, width=256).collect().show()

    # 2. Structural corpus probes.
    print("== duplicate mass ==")
    dedup_cluster_stats(docs).collect().show()

    print("== term-frequency power law (healthy text slopes ~ -1) ==")
    zipf_fit(docs, "text").collect().show()

    # 3. Drift between two 'crawls' (even vs odd halves here).
    print("== snapshot profile drift ==")
    ref = docs.spark.filter(F.col("doc_id") % 2 == 0)
    cur = docs.spark.filter(F.col("doc_id") % 2 == 1)
    profile_diff(ref, cur, cols=["lang", "source"]).collect().show()

    # 4. Metric screens: robust outliers, then does the metric differ by arm?
    print("== MAD outlier screen (per event type) ==")
    flagged = mad_outliers(events.spark, "value", by="event_type")
    flagged.spark.filter("is_outlier").groupBy("event_type").count().show()

    print("== one-way ANOVA across event types ==")
    anova_oneway(events.spark, "event_type", "value").collect().show()

    print("== always-valid sequential test (peek anytime) ==")
    msprt_report(events.spark, "value", "event_id", mu0=45.0, tau=1.0).collect().show()

    # 5. Publishable histogram (seeded Laplace — see the docstring's caveat
    #    before treating this as a real DP release).
    print("== noisy counts ==")
    dp_count_report(events.spark, "event_type", epsilon=0.5).collect().show()


if __name__ == "__main__":
    main()
