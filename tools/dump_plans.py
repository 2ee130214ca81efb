"""Dump .explain('formatted') for named gates to plans/r13/<q>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as e
    from polars_net_spark import get_spark, release_caches

    qs = e.queries()
    spark = get_spark(app_name="dump_plans")
    os.makedirs(os.path.join(REPO, "plans", "r13"), exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            txt = f"ERROR {type(ex).__name__}: {ex}"
        finally:
            release_caches()
        path = os.path.join(REPO, "plans", "r13", f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
