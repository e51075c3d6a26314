"""Storage-efficiency probe: the SURVEY §1.5 claim that parquet encodings
replace the reference's Gorilla chunk compression (double-delta ts + XOR
values, src/gorilla.c:270-340) is a measurable one — this script measures
it.

Writes the same (key, ts, value) samples three ways and reports
bytes/sample:

  plain      parquet defaults (snappy, dictionary+RLE)
  tuned      zstd + BYTE_STREAM_SPLIT on the value column — the
             double-friendly encoding family
  sorted     tuned + sortWithinPartitions(key, ts) — delta-encoded ts
             within runs, the layout write_layout produces

Reference yardstick: Gorilla averages ~1.37 bytes/sample on the
canonical paper workload and the module defaults to compressed chunks;
uncompressed Sample structs are 16 B.  Anything in the low single-digit
bytes/sample at 10M rows makes the "parquet owns encoding" design call
concrete.

Usage: python scripts/storage_probe.py [N_ROWS]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from redistimeseries_spark import get_spark


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("storage_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # realistic series shape: 5000 keys, ~10s cadence with jitter, values
    # as a slow random walk (the Gorilla-favourable regime)
    df = (
        spark.range(n)
        .select(
            F.concat_ws("_", F.lit("k"), (F.col("id") % 5000).cast("string")).alias("key"),
            (
                F.lit(1_700_000_000_000)
                + (F.col("id") / 5000).cast("long") * 10_000
                + F.pmod(F.xxhash64("id"), 1000)
            ).alias("ts"),
            (
                F.round(F.sin(F.col("id") / 97.0) * 50 + (F.col("id") % 7), 2)
            ).alias("value"),
        )
    )
    base = tempfile.mkdtemp(prefix="sparkts_storage_")
    out = {}
    variants = {
        "plain": lambda d, p: d.write.parquet(p),
        "tuned": lambda d, p: d.write.option("compression", "zstd")
        .option("parquet.enable.bytestreamsplit", "true")
        .parquet(p),
        "sorted": lambda d, p: d.repartition(32, "key")
        .sortWithinPartitions("key", "ts")
        .write.option("compression", "zstd")
        .option("parquet.enable.bytestreamsplit", "true")
        .parquet(p),
    }
    for name, write in variants.items():
        p = os.path.join(base, name)
        write(df, p)
        out[name] = round(dir_bytes(p) / n, 3)
    shutil.rmtree(base)
    print(
        json.dumps(
            {
                "metric": "storage_bytes_per_sample",
                "rows": n,
                "unit": "bytes/sample",
                "variants": out,
                "yardsticks": {"uncompressed_sample_struct": 16.0, "gorilla_paper": 1.37},
            }
        )
    )


if __name__ == "__main__":
    main()
