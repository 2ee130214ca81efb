"""Same-session sf0.1 -> sf1 (10x data, 32 fixed cores) slope measurement
for every operator the r12 optimization round touched — the scale-safety
evidence that the mapInArrow kernels / persists / repartitions preserved
(or improved) the data-dominated slopes.

Usage: python tools/slope_r12_opt.py [sf1_dir]
Writes SLOPE_R12_OPT.json (query -> {sf01, sf1, ratio}, min-of-2 each).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TOUCHED = [
    "q399_winnowing",
    "q357_chrf",
    "q350_bleu",
    "q351_rouge",
    "q243_rouge1",
    "q283_cms_freq",
    "q36_simhash",
    "q154_simhash_pairs",
    "q31_minhash_lsh",
    "q353_perm_test",
    "q392_wilcoxon",
    "q84_map_groups",
    "q233_feature_hash",
    "q124_winsorize",
    "q250_weighted_quantile",
    "q309_weighted_quantiles",
    "q280_lorenz",
    "q344_pettitt",
    "q395_anderson_darling",
    "q398_brunner_munzel",
    "q340_cox_ph",
]


def main() -> None:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"

    import __spark_entry__ as e
    from polars_net_spark import get_spark, release_caches

    spark = get_spark(app_name="slope_r12_opt")
    spark.range(1).count()

    def _warm(it):
        import numpy as np  # noqa: F401
        import pandas as pd  # noqa: F401
        import pyarrow as pa  # noqa: F401
        for b in it:
            yield b

    spark.range(64).repartition(32).mapInArrow(_warm, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    qs = e.queries()
    out: dict[str, dict] = {}
    for name in TOUCHED:
        fn = qs[name]
        times = {}
        for tag, d in [("sf01", "/root/testdata/sf0.1"), ("sf1", sf1_dir)]:
            best = 1e9
            for _ in range(2):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
                release_caches()
            times[tag] = round(best, 3)
        times["ratio"] = round(times["sf1"] / max(times["sf01"], 1e-9), 2)
        out[name] = times
        print(f"{name}: sf0.1={times['sf01']} sf1={times['sf1']} "
              f"ratio={times['ratio']}", flush=True)

    payload = {
        "metric": "r12_opt_sf1_slope",
        "method": "same session, min-of-2 per (query, scale), noop sink, "
                  "32 fixed cores, sf1 = tools/gen_scale.py 10 (affine-"
                  "substituted corpus)",
        "rows": out,
    }
    with open(os.path.join(REPO, "SLOPE_R12_OPT.json"), "w") as f:
        json.dump(payload, f, indent=2)
    print("wrote SLOPE_R12_OPT.json")


if __name__ == "__main__":
    main()
