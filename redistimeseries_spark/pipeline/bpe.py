"""Byte-pair-encoding tokenization — a REAL trained subword tokenizer
(Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words with
Subword Units", ACL 2016), superseding the chars/4 estimate that
`pipeline/text.token_counts` ships as `bpe_tokens_est`.  Token counts are
the number every packing and mixture decision keys on
(`packing.pack_sequences(tokens_col=...)` consumes these directly), so
they should come from the tokenizer the trainer will actually run.

Spark-first split of the algorithm:

* **Training** (`bpe_train`): the corpus never collects — Spark computes
  the word-frequency table (one scan + one hash agg, map-side partials;
  the TakeOrderedAndProject `max_vocab` cap bounds driver memory and is
  deterministic: count desc, word asc), and the merge-learning loop runs
  driver-side over that table (`_train_merges`, pure Python — the loop is
  O(vocab * merges) on a Zipf-bounded vocabulary, never on the corpus).
  This is how production BPE training works at 100 TB too: frequency
  extraction is the distributed pass, merge learning is centralized.

* **Application** (`bpe_tokenize` / `bpe_token_counts`): merge ranks
  broadcast in the task closure (KBs), applied by an Arrow `mapInPandas`
  kernel with a per-batch word -> segmentation memo — Zipf's law makes the
  hit rate approach the head vocabulary's token share, so the per-row
  Python cost is O(1) amortized (the dedup/EWMA kernel discipline).  The
  word array is projected JVM-side (lower + split, whole-stage codegen)
  so Python only ever sees word lists.

Vocabulary conventions (`mode`):

* `mode="words"` (default): word-internal BPE over the pipeline's shared
  `WORD_RE` words (lowercased alnum runs — the same tokenization the
  dedup / retrieval / classifier family uses), no end-of-word marker;
  punctuation and whitespace are not counted.  Symbols start as single
  characters.

* `mode="bytes"` (round 8): GPT-2-style BYTE-LEVEL BPE — the text
  partitions into pretokens by `PRETOKEN_RE` (letter runs, digit runs,
  whitespace runs, other-char runs; case preserved, EVERYTHING counted),
  and each pretoken decomposes into its UTF-8 bytes, represented as
  lowercase hex pairs ("68", "c3a9" after a merge) so the vocabulary
  stays a plain string table (parquet-safe in bpe_save, CASE-matchable
  in the DuckDB oracle).  This is the mode whose counts track what a
  real byte-level tokenizer (GPT-2 BPE) charges for punctuation,
  whitespace, casing and non-Latin text — the numbers
  `packing.pack_sequences` budgets should key on for natural text,
  where the words mode systematically undercounts.

Determinism (what makes the DuckDB oracle possible): merge learning
breaks frequency ties by lexicographically smallest pair; application
repeatedly merges the LOWEST-RANK pair present.  Merging all occurrences
of that pair left-to-right non-overlapping (what `_merge_word` does) is
equivalent to merging one leftmost occurrence at a time (what the
oracle's recursive CTE does), because a merge can only CREATE pairs of
strictly higher rank than itself — the remaining occurrences stay
minimal until exhausted.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redistimeseries_spark.pipeline.dedup import WORD_RE

# byte-mode pretokenizer: a PARTITION of the text (every char lands in
# exactly one run), verified Spark-regexp_extract_all == DuckDB-RE2 on
# ASCII whitespace, NBSP, \x0b, combining accents and astral emoji
PRETOKEN_RE = r"[A-Za-z]+|[0-9]+|\s+|[^A-Za-z0-9\s]+"
_MODES = ("words", "bytes")


def _check_mode(mode: str) -> None:
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")


def _base_syms(word: str, mode: str) -> list[str]:
    """A pretoken's base-symbol decomposition: single characters (words
    mode) or lowercase hex pairs of its UTF-8 bytes (bytes mode)."""
    if mode == "bytes":
        return [f"{b:02x}" for b in word.encode("utf-8")]
    return [c for c in word]


def _merge_word(syms: list[str], pair: tuple[str, str]) -> list[str]:
    """Merge all left-to-right non-overlapping occurrences of `pair`."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_merges(
    freqs: dict[str, int], num_merges: int, mode: str = "words"
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table: at each
    step, merge the most frequent adjacent symbol pair (ties -> the
    lexicographically smallest pair, for engine-independent determinism).
    Stops early when no pair repeats (every word fully merged)."""
    _check_mode(mode)
    vocab = {w: _base_syms(w, mode) for w in freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = freqs[w]
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = {w: _merge_word(syms, best) for w, syms in vocab.items()}
    return merges


def _pretoken_expr(text_col: str, mode: str):
    """JVM-side pretokenization (codegen) — word array (words mode) or
    PRETOKEN_RE run array (bytes mode); Python only ever sees the runs."""
    if mode == "bytes":
        sql_pat = PRETOKEN_RE.replace("\\", "\\\\")
        return F.expr(f"regexp_extract_all({text_col}, '{sql_pat}', 0)")
    return F.expr(f"array_remove(split(lower({text_col}), '{WORD_RE}'), '')")


def bpe_train(
    docs: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    max_vocab: int = 50_000,
    mode: str = "words",
) -> list[tuple[str, str]]:
    """Train merge ranks on a corpus: Spark aggregates the word-frequency
    table (the only corpus pass), the merge loop runs driver-side.
    `max_vocab` caps the table at the most frequent words (deterministic
    count-desc/word-asc boundary) — tail hapaxes contribute ~nothing to
    pair statistics but dominate vocabulary size."""
    if num_merges <= 0:
        raise ValueError("num_merges must be positive")
    _check_mode(mode)
    rows = (
        docs.select(F.explode(_pretoken_expr(text_col, mode)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(max_vocab)
        .collect()
    )
    return _train_merges({r.w: r.n for r in rows}, num_merges, mode)


def bpe_save(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist trained merge ranks as a tiny parquet table (rank, left,
    right) — the tokenizer artifact a pipeline trains once per corpus
    snapshot and every downstream job loads (the build_text_index
    economics applied to the vocabulary)."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string",
    ).write.mode("overwrite").parquet(path)


def bpe_load(spark, path: str) -> list[tuple[str, str]]:
    """Load merge ranks saved by `bpe_save`, in rank order."""
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r.left, r.right) for r in rows]


def segment_word(
    word: str, ranks: dict[tuple[str, str], int], mode: str = "words"
) -> list[str]:
    """Apply trained merges to one word: repeatedly merge the lowest-rank
    pair present (all occurrences, left-to-right).  The pure-Python
    reference the distributed kernel, the tests, and the SQL oracle all
    agree on."""
    _check_mode(mode)
    syms = _base_syms(word, mode)
    while len(syms) > 1:
        best: tuple[str, str] | None = None
        best_rank: int | None = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        syms = _merge_word(syms, best)
    return syms


def _ranks(merges: list[tuple[str, str]]) -> dict[tuple[str, str], int]:
    return {tuple(p): i for i, p in enumerate(merges)}


def _words_projection(
    docs: DataFrame, id_col: str, text_col: str, mode: str = "words"
) -> DataFrame:
    # JVM-side tokenization (codegen); Python sees word arrays only
    return docs.select(
        F.col(id_col).alias("doc_id"),
        _pretoken_expr(text_col, mode).alias("wa"),
    )


# the word memo carries across Arrow batches within a partition for the
# Zipf hit rate, but is BOUNDED: past this many distinct words it resets
# (CPU stays amortized on the head vocabulary either way; an unbounded
# dict over a high-cardinality partition would grow with row count)
_MEMO_CAP = 1 << 18


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "words",
) -> DataFrame:
    """(doc_id, bpe_tokens) — real BPE token count per document under the
    trained merges (pass the training `mode`; bytes mode counts
    punctuation/whitespace/case the way a deployed byte-level tokenizer
    does).  Arrow kernel with a bounded cross-batch word memo
    (Zipf-bounded miss rate, _MEMO_CAP-bounded memory); zero shuffle —
    one projection + one mapInPandas."""
    _check_mode(mode)
    ranks = _ranks(merges)

    def fn(batches):
        memo: dict[str, int] = {}
        for pdf in batches:
            counts = []
            for wa in pdf["wa"]:
                total = 0
                for w in wa:
                    c = memo.get(w)
                    if c is None:
                        if len(memo) >= _MEMO_CAP:
                            memo.clear()
                        c = len(segment_word(w, ranks, mode))
                        memo[w] = c
                    total += c
                counts.append(total)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "bpe_tokens": counts}
            )

    return _words_projection(docs, id_col, text_col, mode).mapInPandas(
        fn, "doc_id long, bpe_tokens long"
    )


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "words",
) -> DataFrame:
    """(doc_id, tokens) — the full subword token array per document (word
    segmentations concatenated in document order; bytes-mode tokens are
    lowercase hex strings of the merged byte runs).  Same kernel shape as
    `bpe_token_counts` with the segmentations memoized whole (and the
    same _MEMO_CAP bound — segmentation lists are heavier than counts)."""
    _check_mode(mode)
    ranks = _ranks(merges)

    def fn(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for wa in pdf["wa"]:
                row: list[str] = []
                for w in wa:
                    s = memo.get(w)
                    if s is None:
                        if len(memo) >= _MEMO_CAP:
                            memo.clear()
                        s = segment_word(w, ranks, mode)
                        memo[w] = s
                    row.extend(s)
                toks.append(row)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "tokens": toks})

    return _words_projection(docs, id_col, text_col, mode).mapInPandas(
        fn, "doc_id long, tokens array<string>"
    )
