"""Isolated warm gate timing: min/median of N noop-sink runs per gate in ONE
session (the bench context — pool and JIT hot after the warmup).

Usage: python tools/time_gates.py [-n RUNS] [-d SF_DIR] query [query ...]
Prints one line per gate; also dumps JSON to stdout at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "-n":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "-d":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    import __spark_entry__ as e
    from polars_net_spark import get_spark, release_caches

    spark = get_spark(app_name="time_gates")
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
    out = {}
    for name in names:
        ts = []
        for _ in range(runs):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
            release_caches()
        out[name] = {"min": min(ts), "runs": ts}
        print(f"{name}: min={min(ts)} runs={ts}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
