"""Vocabulary construction and token-id encoding.

The tokenizer is the engine's whitespace/lowercase one (token_count /
text.py); this module adds the trainer-facing step: build a top-V vocabulary
from the corpus and encode documents as integer id sequences.

Scale design (100 TB corpus):
- vocab build: one (term)-keyed count aggregate with map-side combine, then
  TakeOrdered top-V — V rows ever reach the driver side of the plan (the
  final rank window runs on the V-row frame, bounded by construction).
- encoding: posexplode (map-side) → broadcast join against the V-row vocab →
  one doc-keyed shuffle to reassemble the id sequence in position order
  (sort_by comparator implode).  The corpus is shuffled exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, Window
from pyspark.sql import functions as F

from ..frame import LazyFrame

__all__ = ["build_vocab", "encode_tokens_frame"]


def _words(text_col: str):
    w = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return F.filter(w, lambda t: F.length(t) > 0)


def build_vocab(
    frame: "LazyFrame | SparkDF",
    text_col: str = "text",
    vocab_size: int = 30000,
    min_count: int = 1,
) -> LazyFrame:
    """(term, token_id, count) for the ``vocab_size`` most frequent terms;
    ranked by count desc then term asc (deterministic ids).  token_id is
    0-based and dense.

    The rank window runs AFTER the top-V limit, so it orders ``vocab_size``
    rows, not the term universe — the only full-corpus work is one
    map-side-combining count aggregate."""
    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    counts = (
        sdf.select(F.explode(_words(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), F.col("term"))
        .limit(vocab_size)
    )
    w = Window.orderBy(F.col("count").desc(), F.col("term"))
    out = counts.select(
        "term", (F.row_number().over(w) - 1).alias("token_id"), "count"
    )
    return LazyFrame(out)


def encode_tokens_frame(
    frame: "LazyFrame | SparkDF",
    vocab: "LazyFrame | SparkDF",
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_id: int = -1,
) -> LazyFrame:
    """(id, token_ids, n_tokens): each document as its integer id sequence
    under ``vocab`` (a build_vocab output or any (term, token_id) frame).
    Out-of-vocabulary tokens encode as ``oov_id`` (set None to drop them).

    posexplode keeps token positions; the vocab joins by broadcast; the
    sequence reassembles with a comparator-sorted implode keyed on the
    position — one corpus shuffle on ``id_col``."""
    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    vdf = vocab if isinstance(vocab, SparkDF) else vocab.spark
    posed = sdf.select(
        F.col(id_col),
        F.posexplode(_words(text_col)).alias("pos", "term"),
    )
    joined = posed.join(F.broadcast(vdf.select("term", "token_id")), "term", "left")
    tid = F.col("token_id")
    if oov_id is None:
        joined = joined.filter(tid.isNotNull())
    else:
        joined = joined.withColumn("token_id", F.coalesce(tid, F.lit(int(oov_id))))
    packed = F.sort_array(
        F.collect_list(F.struct(F.col("pos"), F.col("token_id")))
    )
    out = (
        joined.groupBy(id_col)
        .agg(packed.alias("__p__"))
        .select(
            id_col,
            F.transform("__p__", lambda s: s["token_id"]).alias("token_ids"),
            F.size("__p__").alias("n_tokens"),
        )
    )
    return LazyFrame(out)
