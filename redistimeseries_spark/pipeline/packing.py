"""Sequence packing — assemble documents into fixed-token-budget training
rows.

A pre-training pipeline does not feed documents to the trainer one by one:
it packs them into fixed-length sequences (e.g. 2k/4k/8k tokens) to keep
attention windows full.  The operator assigns every document to exactly one
(group, bin) training row under a token budget.

Spark shape: a document's token count is a row-local expression (the
ws-token count from pipeline/text.py); packing itself is sequential by
nature (a bin's remaining budget depends on every prior assignment), so it
CANNOT be one window expression.  The distributed form fixes a
deterministic group for every doc — `group = doc_id mod n_groups` — and
runs NEXT-FIT packing inside each group via applyInPandas, ordered by
doc_id:

  * deterministic: assignment is a pure function of (doc_id, tokens,
    n_groups, max_tokens) — independent of partitioning, repeatable across
    engines (the DuckDB oracle replays it with a recursive CTE);
  * scalable: groups are the parallel unit; pick n_groups ~ corpus_tokens /
    (target docs per task) and each task packs one bounded slice — no
    global sort, no sequential driver pass.  The packing loop is O(group
    docs) python per group over Arrow-materialized batches;
  * bounded waste: next-fit wastes at most one doc's tokens per boundary
    vs first-fit-decreasing's tighter packing — the price of determinism
    and streaming-friendly order preservation (docs stay in doc_id order
    inside a bin, so curriculum/source ordering survives).

Documents longer than the budget get a bin of their own, flagged
`overflow` (the trainer's chunker splits those downstream).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACKED_SCHEMA = (
    "doc_id long, grp int, bin int, tokens long, overflow boolean"
)


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 2048,
    n_groups: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """(doc_id, grp, bin, tokens, overflow) — every doc assigned to exactly
    one (grp, bin) training row; per-bin token sum <= max_tokens except
    single-doc overflow bins.  `grp * 2^32 + bin` is a globally unique
    sequence id.

    `tokens_col` packs under a PRECOMPUTED per-doc token count instead of
    the default whitespace count — the intended composition with the real
    tokenizer: `pack_sequences(docs.join(bpe.bpe_token_counts(docs, m),
    "doc_id"), tokens_col="bpe_tokens")` budgets bins in the units the
    trainer will actually see."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    # default: ws-token count, same expression pair as text.token_counts
    # (engine-portable: DuckDB's list_filter/string_split_regex mirror it)
    tok_expr = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(F.array_remove(F.split(F.col(text_col), "\\s+"), ""))
    )
    with_tok = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_groups)).cast("int").alias("grp"),
        tok_expr.cast("long").alias("tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, overflow = [], []
        # `used` tracks bin OCCUPANCY, not remaining budget: a zero-token
        # doc consumes no budget but still occupies the bin, and an
        # oversize doc must never share with it
        b, rem, used = 0, max_tokens, False
        for t in pdf["tokens"]:
            if t > max_tokens:
                # oversize doc: a bin of its own (chunked downstream)
                if used:
                    b += 1
                bins.append(b)
                overflow.append(True)
                b, rem, used = b + 1, max_tokens, False
                continue
            if t > rem:
                b, rem, used = b + 1, max_tokens, False
            bins.append(b)
            overflow.append(False)
            rem -= t
            used = True
        pdf["bin"] = pd.Series(bins, dtype="int64").astype("int32")
        pdf["overflow"] = overflow
        return pdf[["doc_id", "grp", "bin", "tokens", "overflow"]]

    return with_tok.groupBy("grp").applyInPandas(pack, PACKED_SCHEMA)


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 256,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, token_offset, n_tokens, chunk_text) — split each
    document into fixed-token windows with overlap (stride < max_tokens
    gives the standard sliding-window chunking a trainer applies to the
    `overflow` rows pack_sequences flags; stride == max_tokens gives
    disjoint chunks).  Whitespace tokens, same convention as
    pack_sequences / token_counts.

    Entirely map-side: token array projected once, chunk starts explode
    from a sequence() (Generate — no shuffle anywhere), each chunk is a
    slice + concat_ws.  Deterministic: chunk_id = start // stride, pure
    function of the text.  Empty/whitespace-only docs produce no chunks
    (a trainer drops them).
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    stride = max_tokens if stride is None else stride
    if not 0 < stride <= max_tokens:
        raise ValueError("stride must be in (0, max_tokens]")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_remove(F.split(F.col(text_col), "\\s+"), "").alias("wa"),
    ).filter(F.size("wa") > 0)
    return (
        toks.select(
            "doc_id",
            "wa",
            F.explode(
                F.sequence(
                    F.lit(0), F.size("wa") - 1, F.lit(stride)
                )
            ).alias("start"),
        )
        .select(
            "doc_id",
            (F.col("start") / stride).cast("long").alias("chunk_id"),
            F.col("start").cast("long").alias("token_offset"),
            F.slice("wa", F.col("start") + 1, max_tokens).alias("__c"),
        )
        .select(
            "doc_id",
            "chunk_id",
            "token_offset",
            F.size("__c").cast("long").alias("n_tokens"),
            F.concat_ws(" ", "__c").alias("chunk_text"),
        )
    )
