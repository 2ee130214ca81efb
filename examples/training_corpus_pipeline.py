"""End-to-end training-corpus preparation: the full round-2 operator chain in
one pipeline — quality gate → PII scrub → per-source cap → benchmark
decontamination → fuzzy dedup → data-mixture sampling → chunk → pack → split.

This is the shape of a real 100 TB pretraining-data job: every stage is a
DataFrame transformation (map-only where possible, one keyed shuffle where
not), so the whole pipeline is a single lazy plan per sink and scales with
the cluster, not the driver.

Run: python examples/training_corpus_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

import polars_net_spark as pl
from polars_net_spark import col, release_caches
from polars_net_spark.llm import (
    cap_per_key,
    chunk_documents,
    contamination_frame,
    dedup_fuzzy,
    gopher_quality_frame,
    mixture_sample,
    pack_sequences,
    pii_metrics_frame,
    split_by_hash,
    token_count,
)
import pyspark.sql.functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = pl.get_spark(app_name="example_training_corpus")

    docs = pl.scan_parquet(f"{sf_dir}/documents.parquet")

    # 1. quality gate: Gopher-style heuristics, keep passing docs
    quality = gopher_quality_frame(docs, min_words=20, min_stop_hits=1)
    keep_ids = quality.filter(col("passes")).select(col("doc_id"))
    gated = docs.join(keep_ids, on="doc_id", how="semi")
    print("after quality gate:", gated.collect().height, "docs")

    # 2. PII scrub: redact emails/phones/IPs in place
    scrubbed = pii_metrics_frame(gated).select(col("doc_id"), col("redacted"))
    clean = gated.drop("text").join(scrubbed, on="doc_id").rename({"redacted": "text"})

    # 3. crawl hygiene: at most 50 docs per source (deterministic priority;
    #    Catalyst's WindowGroupLimit keeps the shuffle at <=50 rows/source
    #    per map task)
    capped = cap_per_key(clean, "source", 50, order_by="n_chars", tie_col="doc_id")

    # 4. benchmark decontamination: drop docs whose 3-gram overlap with the
    #    (stand-in) eval set reaches 50% — the benchmark gram set broadcasts,
    #    so this costs one corpus scan at any scale
    bench = docs.filter(col("doc_id") % 97 == 0)
    contam = contamination_frame(capped, bench, n=3, threshold=0.5)
    dirty = contam.filter(col("contaminated") == 1).select(col("doc_id"))
    decontaminated = capped.join(dirty, on="doc_id", how="anti")
    print("after cap + decontamination:", decontaminated.collect().height, "docs")

    # 4b. blocklist filter: C4-style word-boundary phrase hits, map-only
    from polars_net_spark.llm import blocklist_metrics_frame

    flagged = blocklist_metrics_frame(decontaminated, ["forbidden phrase", "do not train"])
    bad = flagged.filter(col("blocked")).select(col("doc_id"))
    decontaminated = decontaminated.join(bad, on="doc_id", how="anti")

    # 4c. substring dedup: cut corpus-wide duplicated word runs (boilerplate)
    #     out of the surviving docs before document-level dedup
    from polars_net_spark.llm import remove_duplicated_spans

    despanned = remove_duplicated_spans(decontaminated, k=8, min_count=3)
    decontaminated = (
        despanned.drop("text")
        .rename({"cleaned_text": "text"})
        .drop("n_removed_words")
    )
    print("after blocklist + span removal:", decontaminated.collect().height, "docs")

    # 4d. model-based quality score: fastText-style hashed linear classifier
    #     (weights trained offline; scoring is one map-only pass, no UDF)
    from polars_net_spark.llm import linear_quality_score_frame

    W = [0.8, -1.2, 0.3, 2.1, -0.7, 0.0, 1.5, -2.3,
         0.9, -0.4, 1.1, -1.8, 0.6, -0.2, 1.9, -0.9]
    scored = linear_quality_score_frame(decontaminated, W, bias=0.4, threshold=0.3)
    good = scored.filter(col("keep")).select(col("doc_id"))
    decontaminated = decontaminated.join(good, on="doc_id", how="semi")

    # 5. near-dup removal: minhash candidates -> exact verify -> components ->
    #    keep the lowest-id doc per cluster
    canonical = dedup_fuzzy(decontaminated, method="minhash", threshold=0.5, n=3,
                            num_hashes=64, bands=16)
    print("after classifier + fuzzy dedup:", canonical.collect().height, "docs")

    # 5b. per-source TOKEN budget (what the trainer consumes, not doc counts):
    #     whole docs kept in priority order until each source hits its budget
    from polars_net_spark.llm import cap_tokens_per_key

    canonical = cap_tokens_per_key(
        canonical, key_col="source", token_col="n_chars", budget=50_000,
        order_by="n_chars", tie_col="doc_id",
    ).drop("cum_tokens")

    # 6. data mixing: largest subsample with n_chars mass split 50/30/20
    #    across three sources (fully in-plan, reproducible by hash)
    canonical = mixture_sample(
        canonical, "doc_id", "source",
        {"src0": 0.5, "src1": 0.3, "src2": 0.2}, size_col="n_chars",
    )
    print("after mixture sampling:", canonical.collect().height, "docs")

    # 7. chunk into overlapping token windows (the tokenizer-feed unit)
    chunks = chunk_documents(canonical, size=64, overlap=8)

    # 8. pack chunks into fixed token budgets (training sequences)
    sized = chunks.select(
        (col("doc_id") * 10_000 + col("chunk_id")).alias("chunk_key"),
        col("n_tokens"),
    )
    packed = pack_sequences(sized, id_col="chunk_key", budget=256, num_buckets=64)

    # 9. stable train/val/test split, keyed on the ORIGINAL doc id so all of
    #    a document's chunks land in the same split (no eval leakage)
    labeled = split_by_hash(
        chunks.with_columns((col("doc_id")).alias("split_key")),
        "split_key",
    )
    dist = (
        labeled.spark.groupBy("split")
        .agg(F.count("*").alias("chunks"), F.sum("n_tokens").alias("tokens"))
        .orderBy("split")
    )
    print("split distribution:")
    for r in dist.collect():
        print(f"  {r['split']}: {r['chunks']} chunks, {int(r['tokens'])} tokens")
    n_packs = packed.spark.select("bucket", "pack_id").distinct().count()
    print("packs:", n_packs)
    release_caches()


if __name__ == "__main__":
    main()
