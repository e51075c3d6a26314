"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched Pandas functions over mapInPandas.  The decode libraries
(PIL/librosa/ffmpeg) are not in this container, so the actual pixel/sample
decode is STUBBED behind `NotImplementedError` with a deterministic fake
(byte-level features) — the Spark-side plumbing (schema, batching,
partition shape) is real and tested.

Scale notes: binary payloads dominate row size, so the UDF stages call
`payload_budget_repartition` first — task parallelism is sized by TOTAL
PAYLOAD BYTES (one partition per `budget_bytes`), not row count, so a
10k-row slice of 100 MB videos fans out instead of landing on one task
while a 10M-row slice of thumbnails doesn't over-split.  Arrow transfer
inside a partition is streamed in `maxRecordsPerBatch`-row batches, so
peak UDF memory tracks the partition's largest rows, not its total.
Metadata-only predicates are pushed down BEFORE the binary column is ever
read — parquet column pruning means a `where media_type='image'` never
fetches audio bytes.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PAYLOAD_BUDGET = 64 << 20  # 64 MiB of payload per task


def payload_budget_repartition(
    media: DataFrame,
    budget_bytes: int = DEFAULT_PAYLOAD_BUDGET,
    payload_col: str = "payload",
) -> DataFrame:
    """Repartition so each task carries ~`budget_bytes` of payload: one
    sizing aggregate over the payload lengths (an EAGER extra pass — the
    price of byte-aware task sizing; skip it by passing budget_bytes=None
    to the UDF stages when the caller already controls placement), then a
    round-robin repartition into ceil(total / budget) parts.  Round-robin
    balances row counts per task independent of any column's cardinality;
    a single payload larger than the budget necessarily overflows its
    task — decode-side chunking, not placement, is the fix for that (the
    frame sampler's per-offset rows are the pattern).  Streaming frames
    pass through untouched (no eager aggregate is possible there — size
    with maxRecordsPerBatch/maxBytesPerTrigger instead)."""
    if media.isStreaming:
        return media
    sz = F.length(F.col(payload_col)).cast("long")
    total = media.agg(F.sum(sz).alias("t")).collect()[0].t
    if not total:
        return media
    n = max(1, math.ceil(total / budget_bytes))
    return media.repartition(n)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, first_byte long, last_byte long"
)


def attach_payload(docs: DataFrame, media_type: str = "image") -> DataFrame:
    """Fixture adapter: treat the utf-8 bytes of `text` as an opaque media
    payload so the binary plumbing runs on real data."""
    return docs.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.length("text").alias("n_chars"), F.col("lang"), F.col("source")
        ).alias("meta"),
    )


def _decode_real(payload: bytes, media_type: str):
    """The real decoder hook — requires PIL/librosa/av, absent here."""
    raise NotImplementedError(
        "media decode requires imaging/audio libraries not present in this "
        "environment; extract_features uses the deterministic byte-level stub"
    )


def extract_features(
    media: DataFrame,
    use_real_decoder: bool = False,
    budget_bytes: int | None = DEFAULT_PAYLOAD_BUDGET,
) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow
    batches), parallelized by payload bytes (budget_bytes; None skips the
    repartition when the caller already controls placement).  The stub
    features are deterministic byte statistics so the pipeline is
    oracle-checkable end-to-end."""
    if budget_bytes is not None:
        media = payload_budget_repartition(media, budget_bytes)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if use_real_decoder:
                _decode_real(payloads.iloc[0], pdf["media_type"].iloc[0])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1),
                }
            )

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample(
    media: DataFrame,
    every_n_bytes: int = 64,
    budget_bytes: int | None = DEFAULT_PAYLOAD_BUDGET,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled offset (the video
    analogue samples every Nth frame).  Offsets + sampled byte are
    deterministic; the frame decode itself is the stubbed step."""
    if budget_bytes is not None:
        media = payload_budget_repartition(media, budget_bytes)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for off in range(0, len(payload), every_n_bytes):
                    rows.append((doc_id, off, payload[off]))
            yield pd.DataFrame(rows, columns=["doc_id", "offset", "byte_val"])

    return media.mapInPandas(fn, "doc_id long, offset long, byte_val long")
