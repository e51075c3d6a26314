"""Capture .explain("formatted") for the bench queries (plans/r11 evidence).

Usage: python scripts/capture_plans.py <outdir> [suffix] [only_csv]
Writes <outdir>/<query>_<suffix>.txt for each bench query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from redistimeseries_spark import get_spark
from redistimeseries_spark.store import TSStore, read_bucketed_layout


def main():
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    st = TSStore.from_events(spark, sf_dir)

    import bench
    from __spark_entry__ import _dup_corpus, _raw

    raw = _raw(spark, sf_dir)
    dup_docs = _dup_corpus(spark, sf_dir).repartition(4)
    dup_docs.cache().count()
    st.samples.cache().count()
    st.labels.cache().count()
    raw.cache().count()
    latest = st.samples.groupBy("key").agg(
        F.max("ts").alias("ts"), F.max_by("value", "ts").alias("value")
    )
    latest.cache().count()

    import tempfile

    bpath = os.path.join(tempfile.mkdtemp(prefix="sparkts_plans_"), "bucketed")
    st.write_bucketed_layout("bench_bucketed", bpath)
    bucketed = read_bucketed_layout(spark, "bench_bucketed", bpath)

    from redistimeseries_spark.pipeline.retrieval import build_text_index

    tpath = os.path.join(tempfile.mkdtemp(prefix="sparkts_plans_"), "textidx")
    build_text_index(dup_docs, tpath)

    from redistimeseries_spark.pipeline.bpe import bpe_train

    bpe_merges = bpe_train(dup_docs, num_merges=100)

    bms = bench.benchmarks(st, raw, latest, bucketed, dup_docs, tpath, bpe_merges)

    for name, build in bms.items():
        if only and name not in only:
            continue
        df = build()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan.splitlines())} plan lines")


if __name__ == "__main__":
    main()
