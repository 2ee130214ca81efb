"""Registry for operator-internal persisted DataFrames.

Several operators stage intermediates behind ``persist()`` (shared shingle
projections, band entries, token hashes — see llm/).  Locally Spark LRU-evicts
these, but a long-lived session on a real cluster should release them once the
results are consumed.  Operators register their persisted frames here;
``release_caches()`` unpersists everything registered so far.

Strong references on purpose: the Python wrapper is a few hundred bytes; the
JVM-side cached blocks it points at are exactly what we need to keep
addressable until release.
"""

from __future__ import annotations

import contextlib

from pyspark.sql import DataFrame as SparkDF

__all__ = ["register_cache", "release_caches", "cached_count", "scoped_caches"]

_CACHES: list[SparkDF] = []


def register_cache(sdf: SparkDF) -> SparkDF:
    """Persist ``sdf`` and remember it for later release."""
    sdf = sdf.persist()
    _CACHES.append(sdf)
    return sdf


def release_caches() -> int:
    """Unpersist every registered intermediate; returns how many."""
    released = 0
    while _CACHES:
        sdf = _CACHES.pop()
        try:
            sdf.unpersist()
            released += 1
        except Exception:
            pass
    return released


def cached_count() -> int:
    return len(_CACHES)


@contextlib.contextmanager
def scoped_caches():
    """Release every operator-internal persist registered inside the block.

    ``with pls.scoped_caches(): pairs = minhash_lsh_pairs(df).collect()`` —
    on exit the shingle/band staging frames are unpersisted, so a long-lived
    session doesn't accumulate cached blocks.  Terminal sinks
    (``sink_parquet`` etc.) release automatically; use this for driver-side
    consumption (``rows()``, ``to_pandas``) or multi-result pipelines.
    Releasing is always safe: a released intermediate recomputes
    transparently if the plan is re-executed.
    """
    mark = len(_CACHES)
    try:
        yield
    finally:
        while len(_CACHES) > mark:
            sdf = _CACHES.pop()
            try:
                sdf.unpersist()
            except Exception:
                pass
