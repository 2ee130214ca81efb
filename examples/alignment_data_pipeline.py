"""Post-training (alignment) data prep walkthrough with the round-4 wave-2
operators: preference pairs (DPO) → epoch oversampling of the scarce source →
length-bucketed batch assignment → deterministic shuffle.

Every stage is deterministic (md5 hashing, struct-max aggregates) — reruns,
engines, and cluster layouts produce identical batches.

Run: python examples/alignment_data_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

import polars_net_spark as pl
from polars_net_spark.llm import (
    length_bucket_batches,
    oversample_by_weight,
    preference_pairs,
    shuffle_by_hash,
)


def main() -> None:
    pl.get_spark()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    docs = pl.scan_parquet(f"{sf_dir}/documents.parquet")

    # 1. Preference pairs: synthetic prompt groups, quality score = n_chars.
    scored = docs.spark.select(
        (F.col("doc_id") % 50).alias("prompt_id"),
        F.col("doc_id"),
        F.col("text"),
        F.col("n_chars").cast("double").alias("score"),
    )
    pairs = preference_pairs(scored, min_margin=1.0)
    n_pairs = pairs.spark.count()
    print(f"preference pairs: {n_pairs}")

    # 2. Oversample the scarce source 2.5x (deterministic epoch repetition).
    weighted = docs.spark.select(
        "doc_id", "text", "source", "n_chars",
        F.when(F.col("doc_id") % 3 == 0, 2.5).otherwise(1.0).alias("w"),
    )
    epochs = oversample_by_weight(weighted, key_col="doc_id", weight="w")
    print(f"rows after oversampling: {epochs.spark.count()}")

    # 3. Length-bucketed batches of 16, 8 hash shards.
    batched = length_bucket_batches(
        epochs.spark.withColumn(
            "uid", F.concat_ws("#", "doc_id", "epoch_idx")
        ),
        token_col="n_chars", id_col="uid", batch_size=16,
        edges=[200, 400, 800], num_shards=8,
    )
    sizes = (
        batched.spark.groupBy("length_bucket", "shard", "batch_idx")
        .count().groupBy("count").count().orderBy("count")
    )
    print("batch-size histogram (count -> n_batches):")
    for r in sizes.collect():
        print(f"  {r[0]:>3} -> {r[1]}")

    # 4. Deterministic global shuffle for the trainer.
    final = shuffle_by_hash(batched, id_col="uid", seed="epoch0")
    print(f"final rows: {final.spark.count()}")


if __name__ == "__main__":
    main()
