"""Capture .explain("formatted") for selected gate queries (plans/r11).

Usage: python scripts/capture_gate_plans.py <outdir> <suffix> <q1,q2,...> [sf_dir]
Run from the repo root whose __spark_entry__ should be captured.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

import __spark_entry__ as E
from redistimeseries_spark import get_spark


def main():
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3].split(",")
    sf = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture_gate_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    for name in names:
        df = qs[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "->", len(plan.splitlines()), "lines")


if __name__ == "__main__":
    main()
