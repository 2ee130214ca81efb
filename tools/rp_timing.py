"""Same-session timing comparison for the r12 random_projection rewrite
(r11 verdict #4): the r11 plan evaluated the Achlioptas sign s(i,j) as an
IN-PLAN md5 per (row, i, j) — d*out_dim md5 hashes per ROW; r12 precomputes
the identical md5-parity values ONCE driver-side (hashlib) and embeds them
as literals.  This tool times both expressions on the same session & data
and verifies they produce byte-identical projections.

Usage: python tools/rp_timing.py [sf_dir] [out_dim] [repeat]
Writes RP_TIMING_r12.json.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def legacy_projection(sdf, vec_col, out_dim, seed=0, round_to=6):
    """The r11 in-plan expression, reproduced for the measurement."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    even = ("0", "2", "4", "6", "8", "a", "c", "e")

    def sign(i, j):
        h = F.substring(
            F.md5(
                F.concat_ws(
                    "_", F.lit(str(seed)), i.cast("string"), j.cast("string")
                )
            ),
            32,
            1,
        )
        return F.when(h.isin(*even), F.lit(1.0)).otherwise(F.lit(-1.0))

    scale = 1.0 / math.sqrt(float(out_dim))
    comp = lambda j: F.aggregate(  # noqa: E731
        F.zip_with(
            v,
            F.sequence(F.lit(0), F.size(v) - 1),
            lambda x, i: x * sign(i, j),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) * F.lit(scale)
    proj = F.transform(
        F.sequence(F.lit(0), F.lit(int(out_dim) - 1)), lambda j: comp(j)
    )
    proj = F.transform(proj, lambda x: F.round(x, int(round_to)))
    return sdf.withColumn("projected", proj)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from polars_net_spark import get_spark
    from polars_net_spark.llm.similarity import random_projection

    spark = get_spark(app_name="rp_timing")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.count()  # warm the scan

    def run(build):
        best = None
        for _ in range(repeat):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    t_new = run(
        lambda: random_projection(
            emb, "embedding", out_dim=out_dim, round_to=6
        ).spark.select("vec_id", "projected")
    )
    t_old = run(
        lambda: legacy_projection(emb, "embedding", out_dim).select(
            "vec_id", "projected"
        )
    )
    # exactness: identical output (same md5 parities, same arithmetic)
    new_rows = dict(
        random_projection(emb, "embedding", out_dim=out_dim, round_to=6)
        .spark.select("vec_id", F.to_json("projected").alias("p"))
        .collect()
    )
    old_rows = dict(
        legacy_projection(emb, "embedding", out_dim)
        .select("vec_id", F.to_json("projected").alias("p"))
        .collect()
    )
    identical = new_rows == old_rows
    rec = {
        "metric": "random_projection_sign_matrix_timing",
        "sf_dir": sf_dir,
        "out_dim": out_dim,
        "n_rows": emb.count(),
        "runs": repeat,
        "sec_legacy_inplan_md5": t_old,
        "sec_r12_literal_matrix": t_new,
        "speedup": round(t_old / t_new, 2) if t_new else None,
        "outputs_identical": identical,
    }
    print(json.dumps(rec))
    json.dump(rec, open("/root/repo/RP_TIMING_r12.json", "w"), indent=1)
    if not identical:
        raise SystemExit("outputs differ — the rewrite is NOT equivalent")


if __name__ == "__main__":
    main()
