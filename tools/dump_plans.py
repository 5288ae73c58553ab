"""Dump ``explain("formatted")`` for named queries to files.

Usage:
    python tools/dump_plans.py --out plans/r17 --suffix before [names...]
Defaults to HEADLINE + EXTENDED when no names are given. Uses the
engine's own get_spark() so plans match what the bench executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_constants import EXTENDED, HEADLINE


def main() -> None:
    argv = sys.argv[1:]
    out_dir = "plans/r17"
    suffix = "before"
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--out":
            out_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--suffix":
            suffix = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1
    if not names:
        names = HEADLINE + EXTENDED

    from map_reduce_showcase_spark.plans import REGISTRY
    from map_reduce_showcase_spark.plans.registry import _load_all
    from map_reduce_showcase_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="mrs-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = REGISTRY[name].builder(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN FAILED: {type(exc).__name__}: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
