#!/usr/bin/env python
"""Capture .explain("formatted") for bench entries into
plans/$PLANS_ROUND/ (default r14).

Usage: python tools/capture_plans.py <suffix> [entry,entry,...]
Writes plans/<round>/<entry>_<suffix>.txt for each requested bench
entry (default: every entry). Uses the same session/config as bench.py
so routing (size estimates, auto thresholds) matches what the bench
runs.
"""
from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import linktransformer_spark as lt  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", os.environ.get("PLANS_ROUND", "r14"))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = lt.get_spark("lt-capture-plans",
                         master=f"local[{bench.CPUS}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = bench.bench_queries(spark)
    for name, fn in queries.items():
        if only is not None and name not in only:
            continue
        try:
            df = fn(bench.SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"CAPTURE FAILED: {e}"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with io.open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan)}B, Exchange x{n_ex} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
