"""LLM training-data pipeline walkthrough: quality-filter → dedup (exact +
near-dup) → language split → similarity search, over the synthetic
documents/embeddings tables.

Run: python examples/llm_data_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

import polars_net_spark as pl
from polars_net_spark import col, release_caches
from polars_net_spark.llm import (
    cosine_topk,
    dedup_exact,
    minhash_lsh_pairs,
    text_metrics_frame,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = pl.get_spark(app_name="example_llm_pipeline")

    docs = pl.scan_parquet(f"{sf_dir}/documents.parquet")
    emb = pl.scan_parquet(f"{sf_dir}/embeddings.parquet")

    # 1. score every document (one staged pass: tokens, quality, language)
    metrics = text_metrics_frame(docs)
    scored = pl.LazyFrame(
        docs._sdf.join(metrics._sdf, "doc_id")
    )
    print("quality distribution:")
    scored.group_by("lang_pred").agg(
        col("quality").mean().round(3).alias("avg_q"),
        col("doc_id").len().alias("n"),
    ).sort("lang_pred").collect().show()

    # 2. drop low-quality docs, dedup exactly, then near-dup with MinHash+LSH
    kept = scored.filter(col("quality") >= 0.5)
    exact = dedup_exact(kept, text_col="text", id_col="doc_id")
    near_pairs = minhash_lsh_pairs(exact, threshold=0.8)
    drop_ids = near_pairs.select(col("id_b").alias("doc_id")).unique()
    final = pl.LazyFrame(exact._sdf.join(drop_ids._sdf, "doc_id", "left_anti"))
    print(
        f"docs: {docs.collect().height} → quality-kept {kept.collect().height}"
        f" → exact-deduped {exact.collect().height} → near-deduped {final.collect().height}"
    )

    # 3. similarity search: nearest neighbours for the first 3 vectors
    queries = pl.LazyFrame(emb._sdf.limit(3))
    neighbours = cosine_topk(emb, queries, k=3).collect()
    print("nearest neighbours:")
    neighbours.sort(["query_id", "rank"]).show()

    release_caches()  # free the staged intermediates


if __name__ == "__main__":
    main()
