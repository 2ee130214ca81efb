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

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from .splits import _BUCKETS, hash_bucket


def _half_up(x: float) -> int:
    """Half-away-from-zero for non-negative x — matches Spark F.round and
    DuckDB round(); Python's built-in round() is banker's (half-to-even), so
    a fraction like 0.00125 would yield threshold 12 here but 13 in a SQL
    oracle."""
    return int(math.floor(x + 0.5))

__all__ = ["cap_per_key", "sample_stratified_hash", "mixture_sample", "mixture_plan", "temperature_weights", "shuffle_by_hash", "oversample_by_weight", "sample_weighted_hash"]


def oversample_by_weight(
    frame,
    key_col: str,
    weight,
    copy_col: str = "epoch_idx",
    salt: str = "",
):
    """Deterministic epoch oversampling: emit each row ``floor(w)`` times plus
    one more iff its hash draw lands under ``frac(w)`` — so a source with
    weight 2.3 is seen ~2.3 times per training epoch, exactly replicable
    across runs/engines/cluster sizes (the fractional draw is the portable
    md5 bucket keyed on ``key_col``, no RNG).

    ``weight`` is a Column / column name (per-row weight, e.g. a per-source
    epoch factor broadcast-joined upstream, or ``temperature_weights``
    output).  Weights below 1 downsample (floor 0 + bernoulli keep);
    weight 0 drops the row.  Output adds ``copy_col`` (1-based copy index)
    so downstream shuffles (:func:`shuffle_by_hash` keyed on
    (key, copy_idx)) interleave the copies instead of clustering them.

    100 TB: map-only — one sequence+explode per row, no shuffle, no RNG
    state; output size is exactly sum(round-ed weights) of the input.
    """
    from ..frame import LazyFrame

    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    w = F.col(weight).cast("double") if isinstance(weight, str) else weight.cast("double")
    whole = F.floor(w).cast("int")
    fractional = w - F.floor(w)
    extra = (
        hash_bucket(F.col(key_col), salt=salt) < F.round(fractional * _BUCKETS)
    ).cast("int")
    n = whole + extra
    # sequence(1, 0) would DESCEND in Spark — guard so n<1 yields an empty
    # array and the row vanishes under explode.
    copies = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    out = sdf.withColumn(copy_col, F.explode(copies))
    return LazyFrame(out)


def cap_per_key(
    frame,
    key_col: str,
    n: int,
    order_by: str,
    tie_col: str,
    descending: bool = True,
    salt_buckets: int | None = None,
    shuffle_payload: bool = True,
):
    """Keep at most ``n`` rows per ``key_col``, preferring rows by
    ``order_by`` (descending by default) with ``tie_col`` (must be unique,
    e.g. a document id) breaking ties ascending.

    The default (plain window) is already the 100 TB plan on Spark ≥ 3.5:
    Catalyst rewrites ``row_number … filter rn <= n`` into
    ``WindowGroupLimit(Partial)`` *before* the exchange (SPARK-37099), so
    every map task forwards at most ``n`` rows per key — measured 0.3 MB
    shuffled for a 10M-row, 95 %-hot-key input with a 256-byte payload,
    ~30× less than a hand-salted two-phase variant.  Hot keys therefore
    cannot flood a reducer, and wide payload columns never shuffle in bulk.

    Two fenced escape hatches remain for engines without that rule (both
    proven row-identical to the plain plan in tests):

    - ``salt_buckets=s``: an explicit two-phase plan — a pre-window over
      ``(key, xxhash64(tie) % s)`` bounds each salted group at ``n`` rows
      before the true per-key window.
    - ``shuffle_payload=False``: window over a narrow ``(key, order, tie)``
      projection, then broadcast the winning tie ids back as a semi-join so
      full-width rows stay out of the shuffle entirely.
    """
    from ..frame import LazyFrame

    if n < 1:
        raise ValueError("n must be >= 1")
    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    # nulls always LOSE the cap: Spark's ascending default is nulls-first,
    # which would hand null-priority rows the top slots
    order = [
        F.col(order_by).desc_nulls_last()
        if descending
        else F.col(order_by).asc_nulls_last(),
        F.col(tie_col).asc(),
    ]
    ranked = sdf if shuffle_payload else sdf.select(key_col, order_by, tie_col)
    if salt_buckets and salt_buckets > 1:
        salt = F.pmod(F.xxhash64(F.col(tie_col)), F.lit(salt_buckets))
        local = Window.partitionBy(F.col(key_col), salt).orderBy(*order)
        ranked = (
            ranked.withColumn("__local_rn__", F.row_number().over(local))
            .filter(F.col("__local_rn__") <= n)
            .drop("__local_rn__")
        )
    w = Window.partitionBy(key_col).orderBy(*order)
    ranked = (
        ranked.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= n)
        .drop("__rn__")
    )
    if shuffle_payload:
        return LazyFrame(ranked)
    winners = ranked.select(tie_col)
    return LazyFrame(sdf.join(F.broadcast(winners), tie_col, "left_semi"))


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
        thresh = F.lit(_half_up(frac * _BUCKETS))
        cond = F.col(strata_col) == stratum
        bound = F.when(cond, thresh) if bound is None else bound.when(cond, thresh)
    default_thresh = F.lit(_half_up(default_fraction * _BUCKETS))
    bound = default_thresh if bound is None else bound.otherwise(default_thresh)
    return LazyFrame(sdf.filter(bucket < bound))


def _mixture_plan_sdf(sdf, source_col: str, weights: dict[str, float], size_col):
    """(source, __frac__) plan frame: the per-source sampling fraction that
    realizes the target mixture at the largest achievable total size."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if total <= 0 or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative with a positive sum")
    norm = {s: w / total for s, w in weights.items()}

    # integer sum — exact, so the fractions (and thus sample membership) are
    # bit-identical across engines and summation orders; float size columns
    # would reintroduce order-dependent low bits
    size = F.lit(1) if size_col is None else F.col(size_col)
    totals = sdf.groupBy(source_col).agg(F.sum(size).alias("__T__"))
    # anchor the plan on the REQUESTED sources (local literal relation, still
    # lazy), not on what the corpus happens to contain: a weighted source
    # with no mass makes C = min(T/w) = 0, so the whole sample comes back
    # EMPTY — a typo'd source name surfaces loudly instead of silently
    # returning a mixture that violates the requested weights
    requested = sdf.sparkSession.createDataFrame(
        [(s, float(w)) for s, w in norm.items() if w > 0],
        [source_col, "__w__"],
    )
    plan = (
        requested.join(totals, source_col, "left")
        .withColumn("__T__", F.coalesce(F.col("__T__"), F.lit(0)))
        .withColumn("__ratio__", F.col("__T__").cast("double") / F.col("__w__"))
    )
    # global min over the tiny per-source frame — an empty-partition window,
    # not a driver collect, so the builder stays fully lazy
    cmin = F.min("__ratio__").over(Window.partitionBy())
    return plan.withColumn(
        "__frac__",
        F.when(
            F.col("__T__") > 0,
            F.least(F.lit(1.0), cmin * F.col("__w__") / F.col("__T__")),
        ).otherwise(F.lit(0.0)),
    ).select(source_col, "__w__", "__T__", "__frac__")


def mixture_plan(frame, source_col: str, weights: dict[str, float], size_col: str | None = None):
    """Per-source sampling plan ``(source, weight, available, fraction)`` for
    :func:`mixture_sample` — exposed for inspection/monitoring."""
    from ..frame import LazyFrame

    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    out = _mixture_plan_sdf(sdf, source_col, weights, size_col)
    return LazyFrame(
        out.select(
            source_col,
            F.col("__w__").alias("weight"),
            F.col("__T__").alias("available"),
            F.col("__frac__").alias("fraction"),
        )
    )


def mixture_sample(
    frame,
    key_col: str,
    source_col: str,
    weights: dict[str, float],
    size_col: str | None = None,
    salt: str = "",
):
    """Deterministic data-mixture sampling: draw the LARGEST subsample whose
    per-source size shares match ``weights`` (normalized), sized by
    ``size_col`` (token counts; ``None`` = row counts).

    The binding source — the one whose available mass runs out first at the
    target mixture — is taken whole (fraction 1); every other source is
    hash-downsampled to ``C·w_s / T_s`` where ``C = min_s(T_s / w_s)``.
    Sources with zero weight are dropped.  A weighted source with NO corpus
    mass (e.g. a typo'd name) makes ``C = 0`` and the sample comes back
    empty — the contract surfaces the problem instead of silently returning
    a mixture that violates the requested weights; check
    :func:`mixture_plan` to see which source is at fault.

    Fully in-plan: per-source totals are a tiny aggregate joined back by
    broadcast, the global min is an empty-partition window over that
    #sources-row frame, and membership is the same portable md5 bucket as
    :func:`sample_stratified_hash` — no driver collect, no RNG, exactly
    replicable in ANSI SQL.  One corpus scan + one broadcast join at any
    scale.
    """
    from ..frame import LazyFrame

    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    plan = _mixture_plan_sdf(sdf, source_col, weights, size_col).select(
        source_col, "__frac__"
    )
    bucket = hash_bucket(F.col(key_col), salt=salt)
    out = (
        sdf.join(F.broadcast(plan), source_col)
        .filter(bucket < F.round(F.col("__frac__") * _BUCKETS))
        .select(*sdf.columns)
    )
    return LazyFrame(out)


def cap_tokens_per_key(
    frame,
    key_col: str,
    token_col: str,
    budget: int,
    order_by: str,
    tie_col: str,
    descending: bool = True,
):
    """Token-BUDGET cap per key: walk each key's rows in priority order
    (``order_by`` desc by default, ``tie_col`` breaking ties) and keep whole
    rows while the running sum of ``token_col`` stays within ``budget`` —
    the per-domain token-budget trim of a pretraining data recipe (row
    counts cap documents; this caps what the trainer actually consumes).

    One cumulative-sum range window per key — a single shuffle keyed on
    ``key_col``, no iteration.  A row is kept iff its own cumsum (inclusive)
    is <= budget, so documents are never split; the first over-budget doc
    and everything after it drop.  Null priorities sort last (they are the
    first to be trimmed); null token counts count as 0.

    Output: input columns + ``cum_tokens`` (the running total including the
    row itself) for the kept rows.
    """
    from ..frame import LazyFrame

    if budget < 0:
        raise ValueError("budget must be >= 0")
    sdf = frame.spark if hasattr(frame, "spark") else frame
    order = [
        F.col(order_by).desc_nulls_last()
        if descending
        else F.col(order_by).asc_nulls_last(),
        F.col(tie_col).asc(),
    ]
    w = (
        Window.partitionBy(F.col(key_col))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.coalesce(F.col(token_col), F.lit(0))).over(w)
    out = (
        sdf.withColumn("cum_tokens", cum.cast("long"))
        .filter(F.col("cum_tokens") <= budget)
    )
    return LazyFrame(out)


def temperature_weights(
    sizes: dict[str, int], alpha: float = 0.3, total: float = 1.0
) -> dict[str, float]:
    """Temperature-smoothed mixture weights w_i ∝ n_i^alpha (the standard
    multilingual/multi-source rebalancing rule: alpha=1 keeps natural
    proportions, alpha→0 approaches uniform).  Pure driver-side math over
    the per-source size dict — feed the result to :func:`mixture_plan` /
    :func:`mixture_sample`."""
    if not sizes:
        raise ValueError("sizes must be non-empty")
    if any(n < 0 for n in sizes.values()):
        raise ValueError("sizes must be >= 0")
    powed = {k: float(n) ** alpha if n > 0 else 0.0 for k, n in sizes.items()}
    z = sum(powed.values())
    if z == 0:
        raise ValueError("all sizes are zero")
    return {k: total * v / z for k, v in powed.items()}


def shuffle_by_hash(
    frame,
    id_col: str = "doc_id",
    seed: str = "",
):
    """Deterministic global shuffle for training output: order by
    md5(seed || id) — decorrelates source/time ordering before sequence
    packing, reproducible across engines and runs (no RNG state).  One
    range-partitioned sort; at 100 TB this is exactly the sort a training
    pipeline's final write pays anyway, and the hash key range-partitions
    uniformly by construction (no skew)."""
    from ..frame import LazyFrame

    sdf = frame.spark if hasattr(frame, "spark") else frame
    key = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    return LazyFrame(sdf.withColumn("__shuf__", key).orderBy("__shuf__").drop("__shuf__"))


def sample_weighted_hash(
    frame,
    key_col: str,
    weight_col: str,
    k: int,
    by: "str | list[str] | None" = None,
    salt: str = "",
):
    """Weighted sampling WITHOUT replacement, deterministically: the
    Efraimidis–Spirakis A-ES scheme with the RNG replaced by the portable
    md5 hash — draw u = hash(key) ∈ (0,1), score = u^(1/w), keep the k
    highest scores (per ``by`` group if given).  Inclusion probabilities
    follow sequential weighted draws without replacement; reruns, engines,
    and cluster layouts all agree because u is a pure function of the key.

    Zero/negative/null weights are excluded.  Global k uses
    TakeOrderedAndProject (per-partition heaps); grouped k is one window
    shuffle on ``by`` with rank pruned map-side (WindowGroupLimit).
    """
    from ..frame import LazyFrame
    from pyspark.sql import Window

    sdf = frame._sdf if isinstance(frame, LazyFrame) else frame
    keys = [by] if isinstance(by, str) else list(by or [])
    w = F.col(weight_col).cast("double")
    # 48-bit uniform from md5, strictly inside (0, 1)
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 12), 16, 10)
        .cast("double")
        + 0.5
    ) / F.lit(float(1 << 48))
    score = F.pow(u, 1.0 / w)
    staged = sdf.filter(w > 0).withColumn("__score__", score)
    if not keys:
        out = staged.orderBy(F.col("__score__").desc(), F.col(key_col)).limit(int(k))
        return LazyFrame(out.drop("__score__"))
    rn = F.row_number().over(
        Window.partitionBy(*keys).orderBy(F.col("__score__").desc(), F.col(key_col))
    )
    out = staged.withColumn("__rn__", rn).filter(F.col("__rn__") <= int(k))
    return LazyFrame(out.drop("__score__", "__rn__"))


def neyman_allocation(
    frame,
    stratum_col: str,
    value_col: str,
    total_n: int,
    min_per_stratum: int = 2,
) -> "LazyFrame":
    """Optimal (Neyman) sample-size allocation for stratified estimation
    of a mean/total: stratum h gets n_h ∝ N_h·σ_h (bigger and noisier
    strata get more of the budget) — the survey-sampling design that
    minimizes estimator variance for a fixed ``total_n``, and the right
    way to size eval-set draws per source/language bucket instead of
    proportional-only allocation.  σ_h is the sample standard deviation;
    single-value or constant strata (σ=0) receive ``min_per_stratum``
    (they still need representation), with the remaining budget split by
    N_h·σ_h shares and rounded largest-remainder so Σ n_h == total_n and
    no stratum exceeds its population.  When a high-weight stratum hits
    its population cap, its overflow is REDISTRIBUTED proportionally
    over the still-open strata (standard iterative capping), so the
    Σ n_h == total_n contract holds whenever the population allows it;
    ``total_n`` > Σ N_h or < Σ floors raises ValueError (the contract
    is unsatisfiable either way).

    One stratum-keyed map-side-combining aggregate + driver math over the
    (bounded) stratum table.  Output: (stratum, n_pop, sigma, n_alloc)."""
    from ..frame import LazyFrame
    from pyspark.sql import DataFrame as SparkDF

    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    if total_n < 1:
        raise ValueError("total_n must be >= 1")
    v = F.col(value_col).cast("double")
    stats = (
        sdf.filter(F.col(stratum_col).isNotNull() & v.isNotNull())
        .groupBy(F.col(stratum_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_pop"),
            F.coalesce(F.stddev_samp(v), F.lit(0.0)).alias("sigma"),
        )
    )
    rows = stats.collect()  # bounded by stratum cardinality (the contract)
    if not rows:
        raise ValueError("no strata (all-null stratum or value column)")
    floors = {r["stratum"]: min(int(min_per_stratum), int(r["n_pop"])) for r in rows}
    caps = {r["stratum"]: int(r["n_pop"]) for r in rows}
    cap_total = sum(caps.values())
    floor_total = sum(floors.values())
    if int(total_n) > cap_total:
        raise ValueError(
            f"total_n={total_n} exceeds the population Σ N_h={cap_total}; "
            "cannot allocate more samples than rows exist"
        )
    if int(total_n) < floor_total:
        raise ValueError(
            f"total_n={total_n} is below the floor sum Σ min(min_per_stratum, "
            f"N_h)={floor_total}; lower min_per_stratum or raise total_n"
        )
    budget = int(total_n) - floor_total
    weights = {r["stratum"]: float(r["n_pop"]) * float(r["sigma"]) for r in rows}
    alloc = dict(floors)
    left = budget
    # iterative capping: split the remaining budget by N_h·σ_h shares over
    # the still-open strata; when a stratum hits its population cap its
    # overflow re-enters the pool and is re-split proportionally next pass.
    while left > 0:
        open_s = [s for s in caps if alloc[s] < caps[s]]
        if not open_s:  # unreachable given total_n <= cap_total; belt & braces
            break
        wsum = sum(weights[s] for s in open_s)
        if wsum <= 0:
            # no variance signal left: fill by stratum name for determinism
            for s in sorted(open_s, key=str):
                take = min(left, caps[s] - alloc[s])
                alloc[s] += take
                left -= take
                if left <= 0:
                    break
            break
        shares = {s: left * weights[s] / wsum for s in open_s}
        given = 0
        for s in open_s:
            add = min(int(shares[s]), caps[s] - alloc[s])
            alloc[s] += add
            given += add
        left -= given
        if left > 0:
            # largest remainder among still-open strata, name-tiebroken
            order = sorted(
                (s for s in open_s if alloc[s] < caps[s]),
                key=lambda s: (-(shares[s] - int(shares[s])), str(s)),
            )
            for s in order:
                if left <= 0:
                    break
                alloc[s] += 1
                left -= 1
    spark = sdf.sparkSession
    out_rows = [
        (r["stratum"], int(r["n_pop"]), float(r["sigma"]), int(alloc[r["stratum"]]))
        for r in rows
    ]
    schema_t = stats.schema["stratum"].dataType.simpleString()
    out = spark.createDataFrame(
        out_rows, f"stratum {schema_t}, n_pop bigint, sigma double, n_alloc bigint"
    )
    return LazyFrame(out.select(
        "stratum", "n_pop", F.round("sigma", 6).alias("sigma"), "n_alloc"
    ))


__all__.append("neyman_allocation")
