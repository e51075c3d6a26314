"""GROUPBY/REDUCE hot-key probe (BASELINE.md round 8; verdict r7 #7).

The mrange GROUPBY path when ONE label value owns most series: a
synthetic 90%-skewed label over the replicated 1B-row day layout
(scripts/scale_probe.py's /tmp/sparkts_scale_10000), REDUCE sum at 1h
buckets.  What bounds the skew is the plan shape, asserted here:

* both aggregations (per-(key, bucket) and per-(group, bucket)) are
  partial/final hash aggregates — the hot group pre-combines map-side,
  so the exchange carries (group, bucket)-bounded partial rows, never
  the hot group's raw sample multiplicity;
* the exchange keys on (group, bucket), so the hot GROUP still spreads
  across its buckets — no single-task funnel exists for a hot label the
  way bare-key windows had one for a hot series (hot_series_probe.py);
* the fused path (sum/sum commute) collapses to ONE such aggregation.

AQE (enabled session-wide) would additionally split any residual skewed
shuffle partition; with partial aggregation ahead of the exchange there
is normally nothing left to split — the probe records wall time for the
90/10 split vs the balanced label so the claim is measured, not argued.

Usage:
    python scripts/groupby_skew_probe.py [LAYOUT_DIR] [REPLICAS]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from redistimeseries_spark import get_spark
from redistimeseries_spark.operators.multi import ts_mrange
from redistimeseries_spark.store import read_layout

H = 3_600_000


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkts_scale_10000"
    spark = get_spark("groupby_skew_probe")
    spark.sparkContext.setLogLevel("ERROR")
    samples = read_layout(spark, path)

    keys = samples.select("key").distinct()
    # 90%-skewed label: ~10% of keys 'minor', the rest pile on 'major'
    skew_labels = keys.select(
        "key",
        F.lit("skew").alias("label"),
        F.when(
            F.conv(F.substring(F.md5("key"), 1, 4), 16, 10).cast("long") % 10
            == 0,
            F.lit("minor"),
        )
        .otherwise(F.lit("major"))
        .alias("value"),
    ).localCheckpoint()
    balanced_labels = keys.select(
        "key",
        F.lit("bal").alias("label"),
        (
            F.conv(F.substring(F.md5("key"), 1, 4), 16, 10).cast("long") % 10
        ).cast("string").alias("value"),
    ).localCheckpoint()
    dist = {
        r.value: r.cnt
        for r in skew_labels.groupBy("value")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }

    def timed(labels, label, groupby):
        t0 = time.time()
        ts_mrange(
            samples,
            labels,
            [f"{label}!="],
            aggregations=["sum"],
            bucket_dur=H,
            groupby=groupby,
            reduce="sum",
        ).write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 1)

    # plan-shape assert: the skewed query is hash aggregates only — no
    # window, no sort-based agg on the sample axis
    plan = (
        ts_mrange(
            samples, skew_labels, ["skew!="], aggregations=["sum"],
            bucket_dur=H, groupby="skew", reduce="sum",
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" in plan and "Window" not in plan

    out = {
        "layout": path,
        "key_split": dist,
        "skew90_sec": timed(skew_labels, "skew", "skew"),
        "balanced_sec": timed(balanced_labels, "bal", "bal"),
        "plan_hash_agg_only": True,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
