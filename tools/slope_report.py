"""Compute the sf0.1 -> sf1 scale-slope record from bench JSON lines.

Usage: python tools/slope_report.py BENCH_local.json sf1_run1.json [sf1_run2.json ...] [--out BENCH_SF1_rN.json]

sf1 per-query times are the MIN over the given sf1 runs (single-run noise at
this scale is real — see BENCH_SF1.md).  Prints the slope summary and the
steepest per-query ratios for queries with a data-dominated (>= 1 s) sf0.1
baseline, and writes the combined record JSON.
"""

from __future__ import annotations

import json
import sys


def _load(path):
    text = open(path).read()
    try:
        return json.loads(text)  # whole-file JSON (pretty-printed records)
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise SystemExit(f"no JSON line in {path}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    base = _load(args[0])
    runs = [_load(p) for p in args[1:]]
    qb = base["queries"]
    qs1 = {}
    for k in runs[0]["queries"]:
        vals = [r["queries"][k] for r in runs if k in r["queries"]]
        qs1[k] = min(vals)
    common = sorted(set(qb) & set(qs1))
    wall_base = sum(qb[k] for k in common)
    wall_sf1 = sum(qs1[k] for k in common)
    ratios = {k: (qs1[k] / qb[k] if qb[k] > 0 else None) for k in common}
    heavy = {k: r for k, r in ratios.items() if qb[k] >= 1.0 and r is not None}
    med_heavy = sorted(heavy.values())[len(heavy) // 2] if heavy else None
    med_all = sorted(v for v in ratios.values() if v is not None)
    med_all = med_all[len(med_all) // 2] if med_all else None
    print(f"queries compared: {len(common)}")
    print(f"suite wall sf0.1 {wall_base:.1f}s -> sf1 {wall_sf1:.1f}s  slope {wall_sf1/wall_base:.2f}x on 10x data")
    print(f"median per-query ratio: all {med_all:.2f}x, data-dominated (>=1s base) {med_heavy:.2f}x over {len(heavy)} queries")
    print("\nsteepest data-dominated slopes:")
    for k, r in sorted(heavy.items(), key=lambda kv: -kv[1])[:10]:
        print(f"  {k}: {qb[k]:.2f}s -> {qs1[k]:.2f}s  {r:.2f}x")
    print("\nqueries above 5x (any baseline):")
    over = {k: r for k, r in ratios.items() if r and r > 5}
    for k, r in sorted(over.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {qb[k]:.2f}s -> {qs1[k]:.2f}s  {r:.2f}x")
    if not over:
        print("  none")
    if out_path:
        rec = {
            "metric": "sf1_scale_slope",
            "n_queries": len(common),
            "wall_sf01": round(wall_base, 3),
            "wall_sf1": round(wall_sf1, 3),
            "slope": round(wall_sf1 / wall_base, 4),
            "median_ratio_all": round(med_all, 4),
            "median_ratio_data_dominated": round(med_heavy, 4),
            "n_runs_sf1": len(runs),
            "queries_sf1_min": {k: qs1[k] for k in common},
        }
        json.dump(rec, open(out_path, "w"), indent=1)
        print(f"\nwrote {out_path}")


if __name__ == "__main__":
    main()
