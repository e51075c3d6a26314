"""Streaming-index compaction probe (BASELINE.md "index maintenance").

Builds a TextIndexStream store from N micro-batches over the sf0.1 dup
corpus, measures the b12-protocol indexed BM25 query (selective term
"dup", k=20, best-of-3) on the fragmented store, runs compact_index,
and re-measures — plus the parquet file counts that explain the delta.

Usage:
    python scripts/index_compaction_probe.py [N_BATCHES] [COMPACT_EVERY]
    # default 50 batches; COMPACT_EVERY > 0 builds the stream with
    # in-stream auto-compaction instead of one manual pass at the end
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from redistimeseries_spark import get_spark


def main():
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    compact_every = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("compaction_probe")
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import _dup_corpus
    from redistimeseries_spark.pipeline.index_maintenance import (
        compact_index,
        index_file_counts,
    )
    from redistimeseries_spark.pipeline.retrieval import (
        TextIndexStream,
        bm25_topk_indexed,
    )

    docs = _dup_corpus(spark, sf_dir).cache()
    docs.count()
    path = os.path.join(tempfile.mkdtemp(prefix="sparkts_cprobe_"), "tix")
    stream = TextIndexStream(
        spark, path, compact_every=compact_every or None
    )
    t0 = time.time()
    for i in range(n_batches):
        stream.process_batch(docs.filter(f"doc_id % {n_batches} = {i}"), i)
    build_s = time.time() - t0

    def q():
        return bm25_topk_indexed(spark, path, "dup", k=20)

    def best_of(n=3):
        best = float("inf")
        for _ in range(n):
            t = time.time()
            q().write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t)
        return round(best, 3)

    pre_files = index_file_counts(spark, path)
    pre_t = best_of()
    t0 = time.time()
    compact_index(spark, path)
    compact_s = time.time() - t0
    post_files = index_file_counts(spark, path)
    post_t = best_of()

    print(
        json.dumps(
            {
                "n_batches": n_batches,
                "compact_every": compact_every,
                "stream_build_sec": round(build_s, 1),
                "files_pre": pre_files,
                "files_post": post_files,
                "b12_pre_sec": pre_t,
                "b12_post_sec": post_t,
                "compact_sec": round(compact_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
