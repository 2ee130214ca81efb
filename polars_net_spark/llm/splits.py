"""Deterministic dataset splitting for training pipelines.

Reproducible splits are a correctness feature at 100 TB: random sampling
(`sample_frac`) changes between runs and between executors, so train/test
membership must instead be a pure function of a stable key.  These operators
hash the key with md5 (engine-portable, so the DuckDB oracle can replicate
the assignment bit-for-bit), reduce the first 8 hex digits to a bucket, and
map buckets to named splits / folds.

Map-only Column expressions — no shuffle, no RNG state, no Python.  A row's
split never changes when the corpus grows, is re-partitioned, or is
re-processed on a different cluster — the property that matters for
leak-free train/eval separation.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["hash_bucket", "split_by_hash", "kfold_by_hash"]

_BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "", num_buckets: int = _BUCKETS) -> Column:
    """Deterministic bucket in [0, num_buckets): md5 of (salt || key-as-string),
    first 8 hex digits as an integer, mod num_buckets.  Portable across
    engines (md5 + base-16 conversion only)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    val = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    return F.pmod(val, F.lit(num_buckets))


def split_by_hash(
    frame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
):
    """Assign every row a named split ('train'/'val'/'test' by default) from
    a hash of ``key_col``.  Weights are fractions summing to ~1; boundaries
    are integer bucket thresholds so the assignment is exact and replicable.
    """
    from ..frame import LazyFrame

    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")

    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    bucket = hash_bucket(F.col(key_col), salt=salt)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        # half-up (not Python's banker's round): matches Spark F.round and
        # DuckDB round(), so SQL-replicated boundaries agree at exact .5
        bound = int(math.floor(cum * _BUCKETS + 0.5))
        cond = bucket < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return LazyFrame(sdf.withColumn(split_col, expr))


def kfold_by_hash(
    frame,
    key_col: str,
    k: int = 5,
    salt: str = "",
    fold_col: str = "fold",
):
    """Assign every row a fold id in [0, k) from the same portable hash —
    cross-validation folds that are stable across runs and engines."""
    from ..frame import LazyFrame

    if k < 2:
        raise ValueError("k must be >= 2")
    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    fold = hash_bucket(F.col(key_col), salt=salt, num_buckets=k).cast("long")
    return LazyFrame(sdf.withColumn(fold_col, fold))


def split_leakage_safe(
    frame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
    cluster_col: str | None = None,
    group_col: str = "split_group",
):
    """Leakage-safe split assignment: the split is a hash of the row's
    DUPLICATE-GROUP key, not the row id, so exact copies of a document can
    never straddle train and test — the failure mode row-keyed
    split_by_hash silently allows and the #1 source of eval contamination
    in web corpora.

    The group key is md5 of the normalized text (lower + trim + whitespace
    collapse) by default; pass ``cluster_col`` (e.g. dedup_clusters'
    cluster id) to extend the guarantee to NEAR-duplicates.  Emits the
    group key (``group_col``) so audits can verify the invariant
    "one group -> one split" directly.

    Scale shape: pure map-only Column math — no shuffle, no RNG, no join;
    a row's split never changes when the corpus grows or repartitions
    (same portability contract as split_by_hash; the DuckDB oracle
    replicates md5 + hex fold bit-for-bit)."""
    from ..frame import LazyFrame

    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    if cluster_col is not None:
        gkey = F.col(cluster_col).cast("string")
    else:
        norm = F.regexp_replace(
            F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
            r"\s+", " ",
        )
        gkey = F.md5(norm)
    staged = sdf.withColumn(group_col, gkey)
    return split_by_hash(staged, group_col, weights, salt, split_col)


__all__.append("split_leakage_safe")
