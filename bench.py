"""Benchmark harness (BASELINE.md protocol).

Runs the headline workloads (B1-B7 analogues of the reference's benchmark
matrix) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced with the noop sink (full execution, no driver
collect), timed after a JVM warm-up pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from redistimeseries_spark import get_spark
from redistimeseries_spark.operators.labels import matched_keys
from redistimeseries_spark.operators.multi import ts_mget, ts_mrange
from redistimeseries_spark.operators.range_query import ts_range
from redistimeseries_spark.store import TSStore, read_bucketed_layout
from redistimeseries_spark.write.dup_policy import resolve_duplicates

H = 3_600_000


def benchmarks(st, raw, latest, bucketed, dup_docs, text_index_path, bpe_merges):
    from redistimeseries_spark.pipeline.dedup import dedup_pipeline

    def _dedup_pipeline_bench():
        # production banding (16 hashes / 4 bands -> 4 rows per band): the
        # sf corpus is boilerplate-heavy, and 2-row bands explode it to
        # 1.87M candidate pairs (10k docs) where 4-row bands propose 291k
        # with byte-identical final keep decisions (BASELINE.md round 4)
        return dedup_pipeline(dup_docs, num_hashes=16, bands=4)

    def _bm25():
        from redistimeseries_spark.pipeline.retrieval import bm25_topk

        return bm25_topk(dup_docs, "fast table scan query", k=20)

    def _bm25_indexed():
        from redistimeseries_spark.pipeline.retrieval import bm25_topk_indexed

        # "dup" is the corpus's one selective term (~2.5% of docs — the
        # planted near-duplicate marker); the selective shape is what the
        # index exists for (BASELINE.md: matched-postings volume dominates
        # stopword-dense queries on either path)
        return bm25_topk_indexed(
            dup_docs.sparkSession, text_index_path, "dup", k=20
        )

    return {
        # B1: TS.RANGE full-series scan (scaling-ts_range_90k_datapoints.yml)
        "b1_range_full_key": lambda: ts_range(st.samples, keys="click_3"),
        # B2: TS.MRANGE AVG 1h over one label's series
        "b2_mrange_avg_1h": lambda: ts_mrange(
            st.samples, st.labels, ["type=click"], aggregations=["avg"], bucket_dur=H
        ),
        # B3: max 1h, ~10% of series (user_bucket=0 -> 5/50 keys)
        "b3_mrange_max_10pct": lambda: ts_mrange(
            st.samples, st.labels, ["user_bucket=0"], aggregations=["max"], bucket_dur=H
        ),
        # B4: TS.MGET last-sample fan-out, all series, answered from the
        # ingest-maintained latest table (the reference's O(1) lastSample —
        # the scan path is the fallback, see BASELINE.md 100M-row numbers)
        "b4_mget_all": lambda: ts_mget(
            st.samples, st.labels, ["type!="], latest_table=latest
        ),
        # B5: TS.QUERYINDEX
        "b5_queryindex": lambda: matched_keys(st.labels, ["type=click", "parity=even"]),
        # B6: GROUPBY label REDUCE sum
        "b6_groupby_reduce": lambda: ts_mrange(
            st.samples, st.labels, ["type!="], aggregations=["sum"], bucket_dur=H,
            groupby="parity", reduce="sum",
        ),
        # B7: ingest with duplicate-policy merge
        "b7_ingest_dup_last": lambda: resolve_duplicates(
            raw.withColumn("ts", F.expr("ts - ts % 60000")), "last"
        ),
        # B8: the bespoke heavy operator
        "b8_twa_2h": lambda: ts_range(st.samples, aggregations=["twa"], bucket_dur=2 * H),
        # B9: B8 over the key-bucketed (key,ts)-sorted layout — no hash
        # exchange before the (key,bucket) agg, no sort before the window
        # (the 100 TB layout; halves TWA at 100M rows, BASELINE.md)
        "b9_twa_2h_bucketed": lambda: ts_range(
            bucketed, aggregations=["twa"], bucket_dur=2 * H
        ),
        # B10: the composed dedup pipeline (MinHash-LSH propose -> exact
        # n-gram Jaccard verify -> star connected components -> keep) over
        # the sf documents corpus + planted near-identical copies — the
        # LLM-pipeline headline (protocol addition, round 4; BASELINE.md)
        "b10_dedup_pipeline": lambda: _dedup_pipeline_bench(),
        # B11: ad-hoc BM25 top-20 over the sf documents corpus — the
        # retrieval-family headline (protocol addition, round 5;
        # BASELINE.md; the indexed path is probed separately)
        "b11_bm25_topk": lambda: _bm25(),
        # B12: BM25 against the persisted term-bucketed index, selective
        # term — build once in setup, query many; the scan opens only the
        # query terms' bucket partitions (protocol addition, round 6)
        "b12_bm25_indexed": lambda: _bm25_indexed(),
        # B13: per-bucket top-5 series by 6h average (PromQL topk) — one
        # (key, bucket) hash agg + a WindowGroupLimit partial-heap rank
        # (protocol addition, round 6 second wave)
        "b13_topk5_6h": lambda: __import__(
            "redistimeseries_spark.operators.multi", fromlist=["ts_topk"]
        ).ts_topk(st.samples, 6 * H, 5),
        # B14: REAL BPE token counts over the dup corpus (merge ranks
        # trained once in setup, as a deployment would; the measurement
        # is the distributed Arrow apply — protocol addition, round 7)
        "b14_bpe_tokens": lambda: __import__(
            "redistimeseries_spark.pipeline.bpe", fromlist=["bpe_token_counts"]
        ).bpe_token_counts(dup_docs, bpe_merges),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    st = TSStore.from_events(spark, sf_dir)

    from __spark_entry__ import _dup_corpus, _raw

    raw = _raw(spark, sf_dir)
    # the corpus arrives as ~2 parquet splits; spread the map-side
    # minhash pass, but not to all 32 cores — the chain has ~40 stages
    # and at 10k docs per-task scheduling overhead beats extra
    # parallelism.  Re-tuned for the round-5 Arrow minhash kernel (bigger
    # batches amortize the Arrow exchange + per-batch md5 memo better):
    # 4p 4.0-4.5s / 8p 4.3-5.6s / 16p 4.7s / 32p 6.2s best-of-3.  At real
    # scale the scan has many splits and this knob disappears.
    dup_docs = _dup_corpus(spark, sf_dir).repartition(4)
    dup_docs.cache().count()

    # cache the base tables once: the reference serves queries from an
    # in-memory store, so the query benchmark should not re-pay parquet scan
    st.samples.cache().count()
    st.labels.cache().count()
    raw.cache().count()

    # the ingest-maintained last-sample table (StreamingStore keeps this
    # per micro-batch; built once here, as ingest would have left it)
    latest = st.samples.groupBy("key").agg(
        F.max("ts").alias("ts"), F.max_by("value", "ts").alias("value")
    )
    latest.cache().count()

    # key-bucketed (key, ts)-sorted layout for B9 (built once at setup,
    # as a store's physical layout would be)
    import tempfile

    bpath = os.path.join(tempfile.mkdtemp(prefix="sparkts_bench_"), "bucketed")
    st.write_bucketed_layout("bench_bucketed", bpath)
    bucketed = read_bucketed_layout(spark, "bench_bucketed", bpath)

    # persisted BM25 text index for B12 (built once at setup, as an
    # ingest-maintained index would be; build cost is not part of the
    # per-query measurement, same treatment as the bucketed layout)
    from redistimeseries_spark.pipeline.retrieval import build_text_index

    tpath = os.path.join(tempfile.mkdtemp(prefix="sparkts_bench_"), "textidx")
    build_text_index(dup_docs, tpath)

    # BPE merge ranks for B14, trained once at setup (a deployment trains
    # per corpus snapshot; the per-query cost is the distributed apply)
    from redistimeseries_spark.pipeline.bpe import bpe_train

    bpe_merges = bpe_train(dup_docs, num_merges=100)

    bms = benchmarks(st, raw, latest, bucketed, dup_docs, tpath, bpe_merges)

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    force(bms["b1_range_full_key"]())  # warm-up

    # fixed no-op floor (protocol round 8): a constant-work query whose
    # time depends ONLY on scheduler/JVM conditions, never on this repo's
    # code — so a driver-run inflation (BASELINE.md documents a ~30%
    # uniform bump while any other Spark session runs) is attributable
    # from the JSON alone: floor at ~baseline => real regression; floor
    # inflated by the same factor => environment.  Interpretation rule in
    # BASELINE.md "reading BENCH_r{N}".
    def _floor():
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            spark.range(100_000_000).selectExpr("sum(id)").write.mode(
                "overwrite"
            ).format("noop").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    floor = _floor()

    # shuffle floor (round 9): the noop floor is CPU/codegen-bound and
    # missed a host-noise mode where it read AT the idle reference while
    # every real query ran ~25% high (three consecutive idle runs:
    # totals 12.38/9.81/10.37 s with floors 0.078/0.106/0.114 — ANTI-
    # correlated).  Real queries are exchange/memory-bound; this floor
    # is a fixed-work shuffle + hash aggregation, so the pair separates
    # compute noise from memory/shuffle noise.
    def _floor_shuffle():
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            (
                spark.range(20_000_000)
                .groupBy(F.pmod("id", F.lit(65536)).alias("k"))
                .count()
                .write.mode("overwrite")
                .format("noop")
                .save()
            )
            best = min(best, time.time() - t0)
        return round(best, 3)

    floor_shuffle = _floor_shuffle()

    def run_suite():
        """One timed pass: warm-session best-of-2 per query (BASELINE.md
        protocol), except b10 — the ~40-stage Python-heavy dedup chain
        whose spread exceeds the floor pair's resolution — which runs
        best-of-3 with per-rep times published so round-over-round drift
        is attributable (round-11 protocol)."""
        times, reps = {}, {}
        for name, build in bms.items():
            n = 3 if name == "b10_dedup_pipeline" else 2
            rs = []
            for _ in range(n):
                t0 = time.time()
                force(build())
                rs.append(round(time.time() - t0, 3))
            times[name] = min(rs)
            reps[name] = rs
        return times, reps

    times, reps = run_suite()

    # end-of-run contention check (round-11 protocol, BASELINE.md
    # "recording BENCH"): if the floor pair reads >1.3x its idle
    # references AFTER the suite, the run was contended — re-run the
    # suite ONCE and keep the faster total, so a driver-of-record file
    # is not written off a transiently loaded host (BENCH_r10 cost a
    # full re-derivation exactly this way).
    IDLE_FLOOR_NOOP = 0.085  # idle references for this host (BASELINE.md)
    IDLE_FLOOR_SHUFFLE = 0.42
    floor_end, floor_shuffle_end = _floor(), _floor_shuffle()
    contended_rerun = (
        floor_end > 1.3 * IDLE_FLOOR_NOOP
        or floor_shuffle_end > 1.3 * IDLE_FLOOR_SHUFFLE
    )
    if contended_rerun:
        times2, reps2 = run_suite()
        floor_end, floor_shuffle_end = _floor(), _floor_shuffle()
        if sum(times2.values()) < sum(times.values()):
            times, reps = times2, reps2

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "queries_reps": reps,
                "floor_noop_sec": floor,
                "floor_shuffle_sec": floor_shuffle,
                "floor_noop_end_sec": floor_end,
                "floor_shuffle_end_sec": floor_shuffle_end,
                "contended_rerun": contended_rerun,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
