"""Deterministic corpus sampling and per-key caps.

Beyond-reference scope.  Two operations every large-corpus pipeline needs:

- ``cap_per_key`` — keep at most *n* rows per key (the classic "max N
  documents per domain" crawl rule), chosen by a deterministic priority.
- ``sample_stratified_hash`` — per-stratum sampling rates implemented as a
  pure hash filter (same portable md5 bucket as :mod:`.splits`), so the
  sample is reproducible across runs, engines, and cluster sizes — unlike
  ``DataFrame.sampleBy``, whose RNG is partitioning-dependent.

Scale notes: the cap is a top-n-per-key, i.e. one shuffle on the key.  A
single hot key (one domain with 10⁹ documents) would funnel into one window
task; ``salt_buckets`` enables the standard two-phase refinement — a salted
local top-n first (bounding every partition at ``salt_buckets × n`` survivor
rows per key) and the true window only on the survivors.  Because the
ordering is total (priority + unique tie-break), the global top-n is a subset
of the union of per-salt top-ns, so the two-phase result is *identical* to
the single-window result — proven in tests.  Stratified sampling is map-only.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .splits import _BUCKETS, hash_bucket

__all__ = ["cap_per_key", "sample_stratified_hash"]


def cap_per_key(
    frame,
    key_col: str,
    n: int,
    order_by: str,
    tie_col: str,
    descending: bool = True,
    salt_buckets: int | None = None,
):
    """Keep at most ``n`` rows per ``key_col``, preferring rows by
    ``order_by`` (descending by default) with ``tie_col`` (must be unique,
    e.g. a document id) breaking ties ascending.

    ``salt_buckets=s`` routes through the skew-safe two-phase plan: a
    pre-window over ``(key, xxhash64(tie) % s)`` discards everything below
    each salted group's local top-``n`` before the per-key window runs, so no
    single task ever sees more than ``s × n`` rows of a hot key.  Output is
    row-identical to the unsalted plan.
    """
    from ..frame import LazyFrame

    if n < 1:
        raise ValueError("n must be >= 1")
    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    order = [
        F.col(order_by).desc() if descending else F.col(order_by).asc(),
        F.col(tie_col).asc(),
    ]
    if salt_buckets and salt_buckets > 1:
        salt = F.pmod(F.xxhash64(F.col(tie_col)), F.lit(salt_buckets))
        local = Window.partitionBy(F.col(key_col), salt).orderBy(*order)
        sdf = (
            sdf.withColumn("__local_rn__", F.row_number().over(local))
            .filter(F.col("__local_rn__") <= n)
            .drop("__local_rn__")
        )
    w = Window.partitionBy(key_col).orderBy(*order)
    out = (
        sdf.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n)
        .drop("__rn__")
    )
    return LazyFrame(out)


def sample_stratified_hash(
    frame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
):
    """Deterministic stratified sample: a row in stratum *s* survives iff
    ``md5_bucket(key) < round(fractions[s] * 10000)``.  Strata not listed in
    ``fractions`` use ``default_fraction``.  Map-only (no shuffle, no RNG
    state); membership is a pure function of ``(salt, key, stratum)``, so
    re-runs, engine swaps, and corpus growth never reshuffle the sample.
    """
    from ..frame import LazyFrame

    for s, f_ in list(fractions.items()) + [("__default__", default_fraction)]:
        if not 0.0 <= f_ <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0, 1], got {f_}")
    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    bucket = hash_bucket(F.col(key_col), salt=salt)
    bound = None
    for stratum, frac in fractions.items():
        thresh = F.lit(int(round(frac * _BUCKETS)))
        cond = F.col(strata_col) == stratum
        bound = F.when(cond, thresh) if bound is None else bound.when(cond, thresh)
    default_thresh = F.lit(int(round(default_fraction * _BUCKETS)))
    bound = default_thresh if bound is None else bound.otherwise(default_thresh)
    return LazyFrame(sdf.filter(bucket < bound))
