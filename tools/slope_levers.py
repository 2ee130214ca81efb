"""Demonstrate (not just argue) the production levers for the two
by-construction sf1 slope outliers in BENCH_SF1.md — the r7 verdict asked
for an assertion-only run proving the slope flattens when the documented
lever is applied:

- q97_semdedup: the gate PINS the clustering (the precomputed ``label``
  column — a fixed number of clusters) for oracle stability, so 10x corpus
  means 10x cluster occupancy and up to 100x within-cluster pairs.  The
  production lever is scaling the cluster count with the corpus: here the
  hyperplane quantizer's ``num_planes`` grows by log2(scale), keeping
  bucket occupancy ~constant and per-row pair work bounded.

- q154_simhash_pairs: the gate pins (bands=6, bits=60, hamming<=5), so
  band-bucket occupancy grows 10x and candidate pairs superlinearly.  The
  production lever is growing the per-band slice width with the corpus
  (bucket space 2^width ~ N): both scales below run the SAME rule —
  width = the smallest divisor-compatible slice with 2^width >= N*8 —
  giving (bands=5, width=12, h<=4)@sf0.1 and (bands=4, width=15, h<=3)@sf1.
  Fixed 60-bit md5 budget means wider slices cost pigeonhole radius
  (bands-1); at a real deployment you grow bits instead (128-bit simhash).

Each lever row reports wall(sf1)/wall(sf0.1) on 10x data; the suite-median
data-dominated slope is ~1.7x, so <= ~2.5x is "linear with amortization"
and the point of the demonstration is the contrast with the pinned gate's
7.4x / 4.9x.

Usage: python tools/slope_levers.py [--out=SLOPE_LEVERS.json]
Requires /root/repo/.scratch/sf1.0 (tools/gen_scale.py 10).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.scratch/sf1.0"


def _time(fn, spark, *, runs=2):
    """min-of-N wall for one levered query (matches BENCH_SF1 methodology)."""
    from polars_net_spark import release_caches

    best = None
    for _ in range(runs):
        t0 = time.time()
        fn(spark).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        release_caches()
    return round(best, 3)


def q97_lever(sf_dir, num_planes):
    def run(spark):
        import __spark_entry__ as E
        from polars_net_spark.llm import semdedup

        e = E._t(spark, sf_dir, "embeddings")
        return semdedup(
            e, threshold=0.45, cluster_col=None, num_planes=num_planes
        ).spark

    return run


def q154_lever(sf_dir, bands, max_hamming):
    def run(spark):
        import __spark_entry__ as E
        from polars_net_spark.llm import simhash_near_dup_pairs

        d = E._t(spark, sf_dir, "documents")
        return simhash_near_dup_pairs(
            d, max_hamming=max_hamming, bands=bands, bits=60, hash_fn="md5"
        ).spark

    return run


def q171_lever(sf_dir):
    """q171 fuzzy_join with the distinct-value + length-band levers ON.

    The gate's slope driver is duplicate part names: tiling the corpus 10x
    leaves ~the same DISTINCT names but 10x rows per name, so block
    candidates grow ~100x/probe-rate no matter how narrow the blocking
    (identical strings share every block).  distinct_values=True runs the
    Levenshtein stage on distinct names (constant work at any tiling) and
    re-expands via two equi-joins (linear); length_band=True additionally
    splits length-diverse blocks.  Both are EXACT — same pairs, verified by
    tests/test_joins_ext.py::TestFuzzyJoin::test_levers_are_exact."""

    def run(spark):
        import __spark_entry__ as E
        from pyspark.sql import functions as F

        from polars_net_spark.operators.joins_ext import fuzzy_join

        part = E._t(spark, sf_dir, "part")
        left = part.spark.select(
            F.col("p_partkey").alias("lid"), F.col("p_name").alias("name")
        )
        right = part.spark.filter(F.col("p_partkey") % 50 == 7).select(
            (F.col("p_partkey") + 1000000).alias("rid"),
            F.expr("substr(p_name, 2)").alias("name"),
        )
        out = fuzzy_join(
            left, right, on="name", max_distance=2, block_chars=12,
            length_band=True, distinct_values=True,
        )
        return out.spark

    return run


def q116_base(sf_dir):
    """q116 as shipped: row-level windows PARTITION BY l_returnflag (3 keys
    -> parallelism capped at 3 tasks whatever the core count)."""

    def run(spark):
        import __spark_entry__ as E

        return E._q116(spark, sf_dir)

    return run


def q116_lever(sf_dir):
    """Same four rank methods from the ~150-row (flag, quantity) cell table
    (operators/distsort.py cell_ranks): one map-side-combining groupBy +
    broadcast join back — EXACT (q390 is the hash-verified oracle gate)."""

    def run(spark):
        import __spark_entry__ as E

        return E._q390(spark, sf_dir)

    return run


def main() -> None:
    out_path = "SLOPE_LEVERS.json"
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    if not os.path.isdir(SF1):
        raise SystemExit(f"{SF1} missing — run tools/gen_scale.py 10 first")

    from polars_net_spark import get_spark

    spark = get_spark(app_name="slope_levers")
    spark.range(1).count()

    rows = []
    # q97: num_planes 8 (256 buckets / ~6.4k vecs) -> 11 (2048 / ~64k):
    # occupancy ~25 vectors per bucket at BOTH scales
    a = _time(q97_lever(SF01, 8), spark)
    b = _time(q97_lever(SF1, 11), spark)
    rows.append(
        {
            "query": "q97_semdedup",
            "lever": "num_planes 8 -> 11 (cluster count ~ corpus; occupancy constant)",
            "sf01_sec": a,
            "sf1_sec": b,
            "ratio": round(b / a, 2),
        }
    )
    print(f"q97 lever: {a}s -> {b}s = {b / a:.2f}x on 10x data", flush=True)

    # q154: slice width 12 (4096 buckets / 5k docs) -> 15 (32768 / 50k):
    # occupancy ~1.2-1.5 docs per bucket at BOTH scales
    a = _time(q154_lever(SF01, 5, 4), spark)
    b = _time(q154_lever(SF1, 4, 3), spark)
    rows.append(
        {
            "query": "q154_simhash_pairs",
            "lever": "band width 12 -> 15 bits (bucket space ~ corpus; fixed 60-bit budget)",
            "sf01_sec": a,
            "sf1_sec": b,
            "ratio": round(b / a, 2),
        }
    )
    print(f"q154 lever: {a}s -> {b}s = {b / a:.2f}x on 10x data", flush=True)

    # q171: same gate parameterization, exact-result levers ON at both scales
    # (since r11 this IS fuzzy_join's default plan — re-measured per the r10
    # verdict's done-criteria for the default flip)
    a = _time(q171_lever(SF01), spark)
    b = _time(q171_lever(SF1), spark)
    rows.append(
        {
            "query": "q171_fuzzy_join",
            "lever": "distinct_values=True + length_band=True (Levenshtein on distinct names; exact, same pairs; the DEFAULT since r11)",
            "sf01_sec": a,
            "sf1_sec": b,
            "ratio": round(b / a, 2),
        }
    )
    print(f"q171 lever: {a}s -> {b}s = {b / a:.2f}x on 10x data", flush=True)

    # q116: row-level 3-key window vs the ~150-row cell-table plan (q390) —
    # both at sf0.1 and sf1, so the row shows the same-scale speedup AND the
    # lever's own slope
    base01 = _time(q116_base(SF01), spark)
    base1 = _time(q116_base(SF1), spark)
    lev01 = _time(q116_lever(SF01), spark)
    lev1 = _time(q116_lever(SF1), spark)
    rows.append(
        {
            "query": "q116_rank_methods",
            "lever": "cell_ranks (q390): rank methods from the (flag, quantity) cell table + broadcast join — exact, hash-verified vs the q116 oracle",
            "sf01_sec": lev01,
            "sf1_sec": lev1,
            "ratio": round(lev1 / lev01, 2),
            "base_sf01_sec": base01,
            "base_sf1_sec": base1,
            "base_ratio": round(base1 / base01, 2),
        }
    )
    print(
        f"q116 base: {base01}s -> {base1}s = {base1 / base01:.2f}x; "
        f"cell_ranks lever: {lev01}s -> {lev1}s = {lev1 / lev01:.2f}x",
        flush=True,
    )

    rec = {"metric": "sf1_slope_levers", "rows": rows}
    json.dump(rec, open(out_path, "w"), indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()


def q173_lever(sf_dir):
    """PRODUCTION shape of the q173 session windows: watermark + APPEND
    mode to a noop streaming sink — state bounded by the watermark, no
    driver materialization.  The GATE pins complete-mode + memory sink
    (deterministic table for the oracle), which materializes every
    session on the driver heap — at sf10 (10M events) that harness shape
    OOMs the JVM; a real deployment writes append-mode to a
    distributed sink exactly as here."""

    def run(spark):
        import os
        import tempfile

        import __spark_entry__ as E
        from pyspark.sql import functions as F

        src_dir = E._stream_stage_dir(sf_dir, "events")
        schema = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 100000)
            .parquet(src_dir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
            .groupBy(
                F.session_window("ts", "30 minutes").alias("w"),
                F.col("user_id"),
            )
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_v"))
        )
        with E._stream_gate_conf(spark):
            q = (
                stream.writeStream.format("noop")
                .option("checkpointLocation", tempfile.mkdtemp(prefix="q173lev_"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(600)
            q.stop()
        return spark.range(1)

    return run
