"""Plan + timing sweep over every declared gate query (guide §1).

For each queries() entry: capture .explain("formatted"), count Exchange /
Python-boundary nodes / per-file parquet scans, and (optionally) time the
noop-sink execution best-of-2.  Output: one JSON line per query to stdout.

Usage: python scripts/sweep_queries.py [sf_dir] [--time] [only ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from redistimeseries_spark import get_spark


def plan_stats(df):
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    stats = {
        "exchanges": len(re.findall(r"\bExchange\b", tree)),
        "bcast_exchanges": len(re.findall(r"BroadcastExchange", tree)),
        "reused": len(re.findall(r"ReusedExchange", tree)),
        "python_nodes": len(
            re.findall(
                r"MapInPandas|ArrowEval|BatchEvalPython|FlatMapGroupsInPandas",
                tree,
            )
        ),
        "sorts": len(re.findall(r"\bSort\b", tree)),
        "windows": len(re.findall(r"\bWindow\b", tree)),
        "smj": len(re.findall(r"SortMergeJoin", tree)),
        "plan_lines": len(tree.splitlines()),
    }
    scans = re.findall(r"file:[^\s\]]*?/([A-Za-z0-9_.]+\.parquet)", plan)
    from collections import Counter

    c = Counter(scans)
    stats["scan_files"] = dict(c)
    stats["max_same_file_scans"] = max(c.values()) if c else 0
    return stats, plan


def main():
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0].startswith("/"):
        sf, args = args[0], args[1:]
    do_time = "--time" in args
    args = [a for a in args if a != "--time"]
    only = set(args) or None
    spark = get_spark("sweep")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    out = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"name": name}
        try:
            df = fn(spark, sf)
            stats, _ = plan_stats(df)
            rec.update(stats)
            if do_time:
                ts = []
                for _ in range(2):
                    t0 = time.time()
                    fn(spark, sf).write.mode("overwrite").format("noop").save()
                    ts.append(round(time.time() - t0, 3))
                rec["sec"] = min(ts)
                rec["reps"] = ts
        except Exception as exc:
            rec["err"] = f"{type(exc).__name__}: {exc}"[:200]
        print(json.dumps(rec), flush=True)
        out.append(rec)


if __name__ == "__main__":
    main()
