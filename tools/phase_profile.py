"""Per-query phase profiler (optimization guide §1): split each gate's wall
into build (driver-side fn() incl. any internal collect jobs), plan
(analysis+optimization+physical planning of the returned frame), and exec
(noop-sink run), plus the Spark job count — so optimization effort goes at
the measured cost center, not the guessed one.

Usage:
  python tools/phase_profile.py [--top N] [--sf DIR] [query ...]

Writes PHASE_PROFILE_r12.json (query -> {build, plan, exec, total, jobs}).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    top_n = 0
    sf_dir = "/root/testdata/sf0.1"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--top":
            top_n = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    import __spark_entry__ as e
    from polars_net_spark import get_spark, release_caches

    qs = e.queries()
    if top_n:
        with open(os.path.join(REPO, "BENCH_local.json")) as f:
            prev = json.load(f)["queries"]
        ranked = sorted(prev.items(), key=lambda kv: -kv[1])
        names.extend(k for k, _ in ranked[:top_n] if k in qs and k not in names)
    if not names:
        names = list(qs)

    spark = get_spark(app_name="phase_profile")
    sc = spark.sparkContext
    spark.range(1).count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        sc.setJobGroup(name, name)
        tracker = sc.statusTracker()
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            t1 = time.time()
            _ = df._jdf.queryExecution().executedPlan().toString()
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            jobs = len(tracker.getJobIdsForGroup(name))
            out[name] = {
                "build": round(t1 - t0, 3),
                "plan": round(t2 - t1, 3),
                "exec": round(t3 - t2, 3),
                "total": round(t3 - t0, 3),
                "jobs": jobs,
            }
            print(f"{name}: build={t1-t0:.2f} plan={t2-t1:.2f} "
                  f"exec={t3-t2:.2f} jobs={jobs}", flush=True)
        except Exception as ex:  # noqa: BLE001
            out[name] = {"error": f"{type(ex).__name__}: {str(ex)[:200]}"}
            print(f"{name}: ERROR {ex}", flush=True)
        finally:
            sc.setJobGroup("", "")
            release_caches()

    path = os.path.join(REPO, "PHASE_PROFILE_r12.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
