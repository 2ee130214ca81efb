"""Corpus-prep pipeline walkthrough (round-4 operators): canonical-URL
dedup → bigram-LM quality scoring → temperature-balanced mixture →
masked-LM corruption → deterministic shuffle.

Every stage is pure Column math or a keyed shuffle — the chain runs as ONE
lazy plan and scales to a cluster unchanged (no RNG state, no driver loops;
all randomness is portable md5 hashing, so reruns and engine ports produce
byte-identical corpora).

Run: python examples/corpus_prep_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import polars_net_spark as pl
from polars_net_spark import release_caches
from polars_net_spark.llm import (
    bigram_logprob_frame,
    mask_tokens_frame,
    shuffle_by_hash,
    temperature_weights,
    url_metrics_frame,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = pl.get_spark(app_name="example_corpus_prep")

    docs = pl.scan_parquet(f"{sf_dir}/documents.parquet")

    # 1. canonical-URL dedup (synthetic URLs here; a crawl has real ones):
    #    normalize → md5 key → keep lowest doc_id per key
    url = F.concat(
        F.lit("https://Mirror"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".Example.COM:443/a/"), (F.col("doc_id") % 50).cast("string"),
        F.lit("?utm_source=x"),
    )
    withu = docs._sdf.select("doc_id", "text", "source", url.alias("url"))
    keys = url_metrics_frame(withu, "url")._sdf.select("doc_id", "url_key")
    from pyspark.sql import Window

    deduped = (
        withu.join(keys, "doc_id")
        .withColumn("__rn__", F.row_number().over(
            Window.partitionBy("url_key").orderBy("doc_id")))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__", "url", "url_key")
    )
    print("after URL dedup:", deduped.count())

    # 2. bigram-LM quality: drop the bottom quartile by mean logprob
    scored = bigram_logprob_frame(deduped, vocab_size=5000)
    kept = pl.LazyFrame(
        deduped.join(scored._sdf, "doc_id")
    ).winsorize("mean_logprob", 0.0, 1.0).filter(
        pl.col("n_bigrams") > 0
    ).with_qcut("mean_logprob", 4, "lp_q").filter(pl.col("lp_q") >= 1)
    print("after quality trim:", kept.collect().height)

    # 3. temperature-balanced source mixture (alpha=0.5 flattens the head)
    sizes = {r["source"]: r["n"] for r in
             kept._sdf.groupBy("source").agg(F.count("*").alias("n")).collect()}
    print("mixture weights:", temperature_weights(sizes, alpha=0.5))

    # 4. masked-LM corruption (reproducible: hash-drawn, seeded)
    masked = mask_tokens_frame(kept._sdf, mask_rate=0.15, span_len=2, seed="demo")

    # 5. deterministic global shuffle, ready to sink partitioned
    final = shuffle_by_hash(masked, "doc_id", seed="demo")
    sample = final._sdf.limit(3).collect()
    for r in sample:
        print(r["doc_id"], r["n_tokens"], r["n_masked"], (r["corrupted"] or "")[:60])

    release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
