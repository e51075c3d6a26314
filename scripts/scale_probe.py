"""Reproducible scale probe (BASELINE.md "Scale check" sections).

Replicates the sf0.1 events table REPLICAS× into the day-partitioned
(key, ts)-sorted layout (each replica becomes a distinct key, so 1000×
data is also 1000× series — the reference's scaling-ts_* benchmark axis),
then times the headline workloads over the on-disk layout with a noop
sink, fresh plans, nothing cached.

Usage:
    python scripts/scale_probe.py [REPLICAS] [LAYOUT_DIR]
    # defaults: 100 replicas (10M rows), /tmp/sparkts_scale_<REPLICAS>

The layout is reused if it already exists (delete the dir to force a
rewrite).  Prints one JSON line per query plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from redistimeseries_spark import get_spark
from redistimeseries_spark.operators.multi import ts_mget, ts_mrange
from redistimeseries_spark.operators.range_query import ts_range
from redistimeseries_spark.store import TSStore, read_layout

H = 3_600_000
DAY = 86_400_000


def build_layout(spark, sf_dir: str, replicas: int, path: str) -> None:
    st = TSStore.from_events(spark, sf_dir)
    # spread the source BEFORE the replica explode: the sf parquet is 1-2
    # splits, and at 10000 replicas (1B rows) a 2-task explode serializes
    # the whole build through two cores
    rep = (
        st.samples.repartition(64)
        .withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
        )
        .select(
            F.concat_ws("_", "key", F.col("__r").cast("string")).alias("key"),
            "ts",
            "value",
        )
    )
    t0 = time.time()
    (
        rep.withColumn("day", F.expr(f"ts div {DAY}"))
        .repartition("day")
        .sortWithinPartitions("key", "ts")
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )
    print(json.dumps({"stage": "write_layout", "sec": round(time.time() - t0, 1)}))


def replicated_labels(spark, sf_dir: str, replicas: int):
    st = TSStore.from_events(spark, sf_dir)
    return (
        st.labels.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1)))
        )
        .select(
            F.concat_ws("_", "key", F.col("__r").cast("string")).alias("key"),
            "label",
            "value",
        )
    )


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    # argv[2]: absolute layout path, OR a comma-joined query-name filter
    # (guard: a bare query list once became a parquet dir at the repo root)
    path = f"/tmp/sparkts_scale_{replicas}"
    only = None
    if len(sys.argv) > 2:
        if sys.argv[2].startswith("/"):
            path = sys.argv[2]
        else:
            only = set(sys.argv[2].split(","))
    if len(sys.argv) > 3:
        only = set(sys.argv[3].split(","))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(path):
        build_layout(spark, sf_dir, replicas, path)

    samples = read_layout(spark, path)
    labels = replicated_labels(spark, sf_dir, replicas).cache()
    labels.count()
    n = samples.count()
    lo, hi = samples.agg(F.min("ts"), F.max("ts")).collect()[0]
    print(json.dumps({"stage": "layout", "rows": n, "path": path}))

    # the ingest-maintained `latest` table (StreamingStore keeps this
    # incrementally; here materialized once batch-side) — TS.MGET becomes
    # O(|keys|) instead of a fact-table scan
    latest_path = f"{path}_latest"
    if not os.path.exists(latest_path):
        t0 = time.time()
        (
            samples.groupBy("key")
            .agg(F.max("ts").alias("ts"), F.max_by("value", "ts").alias("value"))
            .write.mode("overwrite")
            .parquet(latest_path)
        )
        print(json.dumps({"stage": "latest_table_build", "sec": round(time.time() - t0, 1)}))
    latest = spark.read.parquet(latest_path)

    one_key = "click_3_0"
    probes = {
        "b1_range_one_key_full": lambda: ts_range(samples, keys=one_key),
        "b1_range_one_key_7d": lambda: ts_range(
            read_layout(spark, path, start=hi - 7 * DAY, end=hi), keys=one_key
        ),
        "b2_agg_avg_1h_all": lambda: ts_range(
            samples, aggregations=["avg"], bucket_dur=H
        ),
        "b3_mrange_max_label": lambda: ts_mrange(
            samples, labels, ["type=click"], aggregations=["max"], bucket_dur=H
        ),
        "b4_mget_all": lambda: ts_mget(samples, labels, ["type!="]),
        "b4_mget_latest_table": lambda: latest.join(
            F.broadcast(
                labels.filter(F.col("label") == "type").select("key").distinct()
            ),
            "key",
            "left_semi",
        ),
        "b6_groupby_reduce_sum": lambda: ts_mrange(
            samples, labels, ["type!="], aggregations=["sum"], bucket_dur=H,
            groupby="parity", reduce="sum",
        ),
        "b8_twa_2h_all": lambda: ts_range(
            samples, aggregations=["twa"], bucket_dur=2 * H
        ),
        # the sequential-per-key IGNORE kept-chain (vectorized numpy
        # kernel, write/mutate._kept_chain) — must sit on the same profile
        # as the window/agg workloads, not dominate it
        "b10_ignore_chain": lambda: __import__(
            "redistimeseries_spark.write.mutate", fromlist=["ignore_filter"]
        ).ignore_filter(samples, 60_000, 0.5),
        # zero-join as-of: every click sample picks up the latest view
        # sample of its replica bucket — one union + one window
        "b11_asof_join": lambda: __import__(
            "redistimeseries_spark.operators.asof", fromlist=["ts_asof_join"]
        ).ts_asof_join(
            samples.filter(F.col("key").startswith("click_")),
            samples.filter(F.col("key").startswith("view_")).withColumn(
                "key", F.regexp_replace("key", "^view_", "click_")
            ),
        ),
        # gap sessionization + stats, single exchange
        "b12_session_stats": lambda: __import__(
            "redistimeseries_spark.operators.session", fromlist=["session_stats"]
        ).session_stats(
            samples.groupBy("key", "ts").agg(F.max("value").alias("value")),
            30 * 60_000,
        ),
        # bucketed p50/p95/p99: one hash agg, one sorted buffer per
        # (key, bucket) group — cost tracks samples-per-bucket
        "b13_percentiles_2h": lambda: __import__(
            "redistimeseries_spark.operators.percentiles",
            fromlist=["ts_bucket_percentiles"],
        ).ts_bucket_percentiles(samples, 2 * H),
        # reset-aware counter increase: one lag window + one agg (the
        # twa plan shape)
        "b14_increase_2h": lambda: __import__(
            "redistimeseries_spark.operators.rate", fromlist=["ts_increase"]
        ).ts_increase(samples, 2 * H),
        # EWMA + LTTB: sequential per-key Arrow kernels (pandas C ewm /
        # numpy bucket areas), one key shuffle each
        "b15_ewma": lambda: __import__(
            "redistimeseries_spark.operators.smooth", fromlist=["ts_ewma"]
        ).ts_ewma(samples, 0.3),
        "b16_lttb_1000": lambda: __import__(
            "redistimeseries_spark.operators.smooth", fromlist=["ts_lttb"]
        ).ts_lttb(samples, 1000),
        # per-bucket regression slope: one projection + one regr_slope
        # hash agg — the cheapest plan in the family (no window)
        "b17_deriv_2h": lambda: __import__(
            "redistimeseries_spark.operators.rate", fromlist=["ts_deriv"]
        ).ts_deriv(samples, 2 * H),
        # value histogram: floor-bin projection + (key, bin) count agg;
        # output bin-bounded, never sample-bounded
        "b18_value_hist": lambda: __import__(
            "redistimeseries_spark.operators.percentiles",
            fromlist=["ts_value_histogram"],
        ).ts_value_histogram(samples, 25.0),
        # spot rate: lag window + per-key keep-last filter
        "b19_irate": lambda: __import__(
            "redistimeseries_spark.operators.rate", fromlist=["ts_irate"]
        ).ts_irate(samples),
        # event counts: the increase plan with a count instead of a sum
        "b20_changes_2h": lambda: __import__(
            "redistimeseries_spark.operators.rate", fromlist=["ts_changes"]
        ).ts_changes(samples, 2 * H),
        # extrapolation: deriv's hash agg with the intercept kept
        "b21_predict_linear_2h": lambda: __import__(
            "redistimeseries_spark.operators.rate",
            fromlist=["ts_predict_linear"],
        ).ts_predict_linear(samples, 2 * H, H),
        # Holt: the two-state sequential Arrow kernel (the ewma route)
        "b22_holt": lambda: __import__(
            "redistimeseries_spark.operators.smooth", fromlist=["ts_holt"]
        ).ts_holt(samples, 0.4, 0.2),
        # per-bucket top-10 series by 2h average: one hash agg + a
        # WindowGroupLimit partial-heap rank
        "b23_topk10_2h": lambda: __import__(
            "redistimeseries_spark.operators.multi", fromlist=["ts_topk"]
        ).ts_topk(samples, 2 * H, 10),
        # gauge difference: max_by/min_by hash agg, the value_hist plan
        # class (no window at all)
        "b24_delta_2h": lambda: __import__(
            "redistimeseries_spark.operators.rate", fromlist=["ts_delta"]
        ).ts_delta(samples, 2 * H),
        # spot movement: the irate plan with a bare difference
        "b25_idelta": lambda: __import__(
            "redistimeseries_spark.operators.rate", fromlist=["ts_idelta"]
        ).ts_idelta(samples),
        # robust median/MAD: two bucket-bounded percentile aggs + one
        # co-partitioned join (round 8)
        "b26_mad_2h": lambda: __import__(
            "redistimeseries_spark.operators.percentiles", fromlist=["ts_mad"]
        ).ts_mad(samples, 2 * H),
        # sampling-gap report: chunk-local lag + boundary stitch (round 8)
        "b28_gaps": lambda: __import__(
            "redistimeseries_spark.operators.rate", fromlist=["ts_gaps"]
        ).ts_gaps(samples, 120_000),
        # histogram_quantile composed over the value histogram — the
        # second stage touches only bin-bounded frames (round 8)
        "b27_hist_quantile": lambda: (lambda P: P.ts_histogram_quantile(
            P.ts_value_histogram(samples, 10.0), 0.9, 10.0
        ))(__import__(
            "redistimeseries_spark.operators.percentiles",
            fromlist=["ts_histogram_quantile", "ts_value_histogram"],
        )),
        # classical seasonal decomposition: one (key, bucket) hash agg is
        # the only per-sample stage; every later window is
        # #buckets-bounded on the spine (round-10 anchor, verdict r9 #2)
        "b29_decompose_2h": lambda: __import__(
            "redistimeseries_spark.operators.decompose",
            fromlist=["ts_decompose"],
        ).ts_decompose(samples, 2 * H, 12),
        # decompose + per-key OLS fit + horizon explode (rows/key bounded)
        "b30_forecast_2h": lambda: __import__(
            "redistimeseries_spark.operators.decompose",
            fromlist=["ts_forecast"],
        ).ts_forecast(samples, 2 * H, 12, 24),
        # round-11 anchors (verdict r10 next #1): the round-10 newcomers.
        # corr pairs adjacent replicas of the same source key (identical
        # ts sets -> every a-sample matches; ~1/10 of the table flows
        # through the co-partitioned (key_b, ts) equi-join + hash agg —
        # the bucketed-aggregation plan class, deriv's line)
        "b31_corr_2h": lambda: __import__(
            "redistimeseries_spark.operators.correlate", fromlist=["ts_corr"]
        ).ts_corr(
            samples,
            2 * H,
            [
                (f"click_{i}_{r}", f"click_{i}_{min(r + 1, replicas - 1)}")
                for i in range(10)
                for r in range(0, max(replicas - 1, 1), 2)
            ],
        ),
        # CUSUM closed form: growing-frame prefix folds, chunk-stitched
        # (the windowed-chain class)
        "b32_cusum": lambda: __import__(
            "redistimeseries_spark.operators.correlate", fromlist=["ts_cusum"]
        ).ts_cusum(samples, 0.5, 1e6, target=50.0),
        # fused EWM moment pair + band (single-ewma exchange count)
        "b33_ewm_band": lambda: __import__(
            "redistimeseries_spark.operators.smooth", fromlist=["ts_ewm_band"]
        ).ts_ewm_band(samples, 0.3, band_k=2.0),
        # round-11 second wave: rolling quantile (sliding-percentile
        # chunk-context plan), Holt-Winters (bucket-bounded), and the
        # lagged xcorr sweep (adjacent-replica pairs x 3 lags — replica
        # grids share identical ts, so lag 0 carries the full matched
        # volume and the +-2h legs price the x|lags| join fan-out)
        "b34_rolling_quantile": lambda: __import__(
            "redistimeseries_spark.operators.percentiles",
            fromlist=["ts_rolling_quantile"],
        ).ts_rolling_quantile(samples, 0.5, 20),
        "b35_holt_winters": lambda: __import__(
            "redistimeseries_spark.operators.holtwinters",
            fromlist=["ts_holt_winters"],
        ).ts_holt_winters(samples, 2 * H, 12, 0.3, 0.1, 0.2, horizon_n=12),
        "b36_xcorr": lambda: __import__(
            "redistimeseries_spark.operators.correlate", fromlist=["ts_xcorr"]
        ).ts_xcorr(
            samples,
            [
                (f"click_{i}_{r}", f"click_{i}_{min(r + 1, replicas - 1)}")
                for i in range(10)
                for r in range(0, max(replicas - 1, 1), 2)
            ],
            [-2 * H, 0, 2 * H],
        ),
        # round-11 fourth wave: the ACF sweep (the 2x-scan corr shape,
        # pair-free) and full-fleet seasonality detection (acf + the
        # catalog-bounded detrend/peak/descent stages on the 2h grid)
        "b37_acf": lambda: __import__(
            "redistimeseries_spark.operators.correlate", fromlist=["ts_acf"]
        ).ts_acf(samples, 2 * H, 12),
        "b38_detect_period": lambda: __import__(
            "redistimeseries_spark.operators.correlate",
            fromlist=["ts_detect_period"],
        ).ts_detect_period(samples, 2 * H, 12, min_strength=0.1),
        # round-11 fifth wave: the fleet feature vector — one grid
        # hash agg + one per-key window pass + one final agg (the
        # decompose/acf cost class; nothing past the first agg scales
        # with a key's sample count)
        "b39_features": lambda: __import__(
            "redistimeseries_spark.operators.features",
            fromlist=["ts_features"],
        ).ts_features(samples, 2 * H),
        # decompose plan + one catalog-sized agg (the b29 line)
        "b40_seasonal_strength": lambda: __import__(
            "redistimeseries_spark.operators.decompose",
            fromlist=["ts_seasonal_strength"],
        ).ts_seasonal_strength(samples, 2 * H, 12),
    }

    # SPARK_GRAFT_BUCKETED=1: also build the key-bucketed layout and probe
    # the shuffle-free groupBy / sort-free window plans on it (BASELINE.md
    # layout experiment at full probe scale)
    if os.environ.get("SPARK_GRAFT_BUCKETED") == "1":
        from redistimeseries_spark.store import TSStore, read_bucketed_layout

        bk_path = f"{path}_bucketed"
        tbl = f"sparkts_probe_bucketed_{replicas}"
        if not os.path.exists(bk_path):
            t0 = time.time()
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            TSStore.from_dataframes(samples).write_bucketed_layout(tbl, bk_path)
            print(json.dumps({"stage": "bucketed_write", "sec": round(time.time() - t0, 1)}))
        bk = read_bucketed_layout(spark, tbl, bk_path)
        probes["b2_agg_avg_1h_bucketed"] = lambda: ts_range(
            bk, aggregations=["avg"], bucket_dur=H
        )
        probes["b8_twa_2h_bucketed"] = lambda: ts_range(
            bk, aggregations=["twa"], bucket_dur=2 * H
        )

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    times = {}
    for name, build in probes.items():
        if only is not None and name not in only:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            force(build())
            best = min(best, time.time() - t0)
        times[name] = round(best, 2)
        print(json.dumps({"query": name, "sec": times[name]}))

    print(
        json.dumps(
            {
                "metric": "scale_probe_total_wall",
                "replicas": replicas,
                "rows": n,
                "value": round(sum(times.values()), 2),
                "unit": "sec",
                "queries": times,
            }
        )
    )


if __name__ == "__main__":
    main()
