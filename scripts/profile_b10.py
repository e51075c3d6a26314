"""Phase-level wall-clock profile of b10_dedup_pipeline (guide §1).

Replicates dedup_pipeline's internal action sequence with a timer around
every eager step, on the same corpus/bench setup as bench.py, so the
steady-state cost is attributable to phases instead of guessed at.

Usage: python scripts/profile_b10.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from redistimeseries_spark import get_spark
from redistimeseries_spark.pipeline.dedup import (
    connected_components_star,
    minhash_lsh_pairs,
    ngram_jaccard_verify,
)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_b10")
    spark.sparkContext.setLogLevel("ERROR")
    from __spark_entry__ import _dup_corpus

    docs = _dup_corpus(spark, sf_dir).repartition(4)
    docs.cache().count()

    def run_once(tag):
        t = {}

        def mark(name, t0):
            t[name] = round(time.time() - t0, 3)

        spark.sparkContext.setJobDescription(f"{tag}: fp-agg")
        t0 = time.time()
        fp = docs.select("doc_id", F.md5("text").alias("__fp"))
        st = fp.agg(
            F.count(F.lit(1)).alias("n"), F.count_distinct("__fp").alias("g")
        ).collect()[0]
        mark("1_fp_agg", t0)

        t0 = time.time()
        if st.n > st.g:
            reps_df = fp.groupBy("__fp").agg(F.min("doc_id").alias("__rep"))
            fpm = fp.join(reps_df, "__fp").select("doc_id", "__rep")
            rep_docs = docs.join(
                fpm.filter(F.col("doc_id") == F.col("__rep")).select("doc_id"),
                "doc_id",
                "left_semi",
            )
            exact = fpm.filter(F.col("doc_id") != F.col("__rep")).select(
                F.col("__rep").alias("doc_a"), F.col("doc_id").alias("doc_b")
            )
        else:
            rep_docs, exact = docs, None
        mark("2_rep_build_lazy", t0)

        spark.sparkContext.setJobDescription(f"{tag}: verify-build (gsets ckpt)")
        t0 = time.time()
        cand = minhash_lsh_pairs(rep_docs, 16, 4, 5, 1024)
        near = ngram_jaccard_verify(
            rep_docs, cand, 3, 0.4, n_docs=st.n
        ).select("doc_a", "doc_b")
        mark("3_gsets_ckpt", t0)

        spark.sparkContext.setJobDescription(f"{tag}: fused propose+verify+cc")
        t0 = time.time()
        comp = connected_components_star(
            near if exact is None else near.unionByName(exact)
        )
        mark("4_fused_cc", t0)

        spark.sparkContext.setJobDescription(f"{tag}: final join + noop")
        t0 = time.time()
        out = (
            docs.select("doc_id")
            .join(comp, "doc_id", "left")
            .withColumn("canonical", F.coalesce("component", F.col("doc_id")))
            .withColumn("keep", F.col("doc_id") == F.col("canonical"))
            .select("doc_id", "canonical", "keep")
        )
        out.write.mode("overwrite").format("noop").save()
        mark("5_final_noop", t0)
        t["total"] = round(sum(v for k, v in t.items() if k != "total"), 3)
        print(f"{tag}: {t}")
        return t

    for i in range(reps):
        run_once(f"rep{i}")


if __name__ == "__main__":
    main()
