"""Text analysis: language-ID, quality scoring, token counting,
document fingerprinting.

Everything is built-in expression work (JVM, codegen) — no UDFs — so these
run at full scan speed over 100 TB of documents.  The formulas are
deliberately portable (replace/length/md5 arithmetic) so the DuckDB
oracles compute the identical numbers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from redistimeseries_spark.pipeline.dedup import WORD_RE

# marker stopwords per language for the n-gram-free heuristic;
# counted as padded substrings so word boundaries are respected.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "les", "et", "est"],
    "de": ["der", "die", "und", "ist", "das"],
    "es": ["el", "los", "de", "es", "y"],
}


def _occurrences(text: Column, word: str) -> Column:
    """Count word occurrences via length arithmetic (portable to any SQL)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(" "))))
        / (len(needle) - 1)
    ).cast("long")


def lang_score_exprs() -> dict[str, Column]:
    """Per-language marker scores as row-local columns."""
    cols = {}
    for lang, words in LANG_MARKERS.items():
        s = None
        for w in words:
            o = _occurrences(F.col("text"), w)
            s = o if s is None else s + o
        cols[f"score_{lang}"] = s
    return cols


def lang_pred_expr() -> Column:
    """The predicted-language column, row-local (inlines the scores)."""
    scores = lang_score_exprs()
    langs = list(LANG_MARKERS)
    best = F.greatest(*[scores[f"score_{l}"] for l in langs])
    pred = F.lit("unknown")
    for l in reversed(langs):  # earlier language wins ties
        pred = F.when(scores[f"score_{l}"] == best, F.lit(l)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("unknown"))


def lang_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, score_en, score_fr, score_de, score_es, lang_pred)."""
    return docs.select(
        "doc_id",
        *[c.alias(n) for n, c in lang_score_exprs().items()],
        lang_pred_expr().alias("lang_pred"),
    )


def quality_exprs() -> dict[str, Column]:
    """The per-row quality feature columns (row-local: composable into any
    projection without a join)."""
    words = F.array_remove(F.split(F.lower(F.col("text")), WORD_RE), "")
    n_words = F.size(words)
    n_chars = F.length("text")
    n_alpha = F.length(F.regexp_replace(F.lower("text"), "[^a-z]", ""))
    n_punct = F.length(F.regexp_replace("text", "[^.,;:!?]", ""))
    stop = None
    for w in LANG_MARKERS["en"]:
        o = _occurrences(F.col("text"), w)
        stop = o if stop is None else stop + o
    return {
        "n_words": n_words.cast("long"),
        "alpha_ratio": F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(stop / F.greatest(n_words, F.lit(1)), 6),
        "quality": F.round(
            F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.5
            + F.least(stop / F.greatest(n_words, F.lit(1)) * 10, F.lit(1.0)) * 0.3
            + (n_alpha / F.greatest(n_chars, F.lit(1))) * 0.2,
            6,
        ),
    }


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1]:
    word count, mean word length, punctuation ratio, stopword ratio."""
    return docs.select(
        "doc_id", *[c.alias(n) for n, c in quality_exprs().items()]
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (the standard
    chars/4 heuristic, counted on non-space chars)."""
    ws = F.size(F.array_remove(F.split(F.col("text"), "\\s+"), ""))
    non_space = F.length(F.regexp_replace("text", "\\s", ""))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        F.ceil(non_space / 4.0).cast("long").alias("bpe_tokens_est"),
    )


def fingerprints(docs: DataFrame, k: int = 8) -> DataFrame:
    """Content fingerprints: exact md5 of normalized text + a winnowing-style
    min-hash over char k-grams (robust to local edits)."""
    # normalized text projected before the lambda: an inlined
    # regexp_replace re-evaluates per window (O(len^2) per doc)
    grams = F.expr(
        f"transform(sequence(1, greatest(length(nt) - {k - 1}, 1)),"
        f" i -> md5(substring(nt, i, {k})))"
    )
    return docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.col("text")), "\\s+", " ").alias("nt"),
    ).select(
        "doc_id",
        F.md5(F.col("nt")).alias("exact_fp"),
        F.array_min(grams).alias("min_gram_fp"),
    )


# Rabin-Karp polynomial rolling hash: base 257, modulus 2^31-1, Horner
# folding keeps every intermediate < 2^40 (no int64 overflow in either
# engine).  The expression text is engine-neutral (ascii/substr/%), so the
# identical core runs in Spark SQL and the DuckDB oracle.
ROLL_W = 8


def rolling_hash_core(var: str = "i", s: str = "nt", w: int = ROLL_W) -> str:
    # seed cast to BIGINT: ascii() is int32 in both engines and Horner's
    # h*257 would overflow it; the cast promotes the whole chain.
    h = f"CAST(ascii(substr({s}, {var}, 1)) AS BIGINT)"
    for j in range(1, w):
        h = f"(({h} * 257 + ascii(substr({s}, {var} + {j}, 1))) % 2147483647)"
    return h


def rolling_fingerprints(
    docs: DataFrame, w: int = ROLL_W, arrow: bool = True
) -> DataFrame:
    """(doc_id, roll_fp) — winnowing-style minimum of the Rabin-Karp rolling
    hash over all w-char windows of the normalized text.  Entirely map-side
    (one pass, no shuffle) — the same zero-shuffle shape as
    minhash_signatures.

    Default path: an Arrow/numpy kernel — the unrolled expression form
    evaluates the full w-term Horner chain per character position as an
    interpreted lambda, O(len * w) interpreter steps per doc (~14 s for 5k
    x 2KB docs at sf0.1, the slowest single-scan operator in the sweep);
    the kernel runs w vectorized int64 passes over the codepoint array
    instead (measured ~15x).  The arithmetic is IDENTICAL — Spark's
    ascii(substr(nt,i,1)) is the position's code point (0 past the end),
    matching ord() with zero padding, and every intermediate stays under
    2^40 so int64 never wraps — fingerprints are byte-equal (pinned in
    tests).  `arrow=False` keeps the pure-expression plan, which remains
    the oracle-gated reference twin.  Text is normalized JVM-SIDE either
    way, so Python never applies its own lowering/regex."""
    nt = docs.select(
        "doc_id",
        F.regexp_replace(F.lower(F.col("text")), "\\s+", " ").alias("nt"),
    )
    if arrow:
        import numpy as np
        import pandas as pd

        M = 2147483647

        def fp_batches(it):
            for pdf in it:
                out = []
                for s in pdf["nt"]:
                    if s is None:
                        out.append(None)
                        continue
                    n = max(len(s) - w + 1, 1)
                    a = np.zeros(n + w, dtype=np.int64)
                    if s:
                        a[: len(s)][: n + w] = np.fromiter(
                            (ord(c) for c in s[: n + w]),
                            dtype=np.int64,
                            count=min(len(s), n + w),
                        )
                    h = a[:n].copy()
                    for j in range(1, w):
                        h = (h * 257 + a[j : j + n]) % M
                    out.append(int(h.min()))
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "roll_fp": pd.array(out, dtype="Int64")}
                )

        return nt.mapInPandas(fp_batches, "doc_id long, roll_fp long")
    core = rolling_hash_core("i", "nt", w)
    return nt.select(
        "doc_id",
        F.expr(
            f"array_min(transform(sequence(1, greatest(length(nt) - {w - 1}, 1)),"
            f" i -> {core}))"
        ).cast("long").alias("roll_fp"),
    )


def clean_lines(
    docs: DataFrame,
    min_words: int = 3,
    markers: tuple[str, ...] = ("javascript", "lorem ipsum", "cookie"),
) -> DataFrame:
    """(doc_id, text, n_kept, n_dropped, has_brace) — C4's line-level
    cleaning (Raffel et al. 2020 §2.2, the most-copied web-text recipe):
    keep only lines that END IN TERMINAL PUNCTUATION (. ! ? or a closing
    quote) and have at least `min_words` words; drop lines containing a
    boilerplate marker.  `has_brace` surfaces C4's page-level "contains
    '{'" discard signal (code masquerading as prose) for the caller's
    doc filter — the line filter itself never looks at braces.

    Entirely map-side array-HOF expression work: split on newline ->
    F.filter with row-local predicates -> concat_ws.  No shuffle, no
    Python — the scan-speed projection class; the DuckDB oracle replays
    the identical predicates over list_filter."""
    if min_words < 1:
        raise ValueError("min_words must be >= 1")
    lines = F.split(F.col("text"), "\n")

    def keep(l):
        rt = F.rtrim(l)
        punct = F.right(rt, F.lit(1)).isin(".", "!", "?", '"', "”")
        words = (
            F.size(F.filter(F.split(l, "\\s+"), lambda w: w != "")) >= min_words
        )
        boiler = F.lit(False)
        for mk in markers:
            boiler = boiler | (F.instr(F.lower(l), mk) > 0)
        return punct & words & ~boiler

    kept = F.filter(lines, keep)
    return docs.select(
        "doc_id",
        F.concat_ws("\n", kept).alias("text"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_dropped"),
        (F.instr("text", "{") > 0).alias("has_brace"),
    )


def dedup_lines(
    docs: DataFrame, min_chars: int = 30
) -> DataFrame:
    """(doc_id, text, n_removed) — CROSS-CORPUS line dedup: a line that
    occurs in more than one place keeps only its FIRST occurrence
    (smallest (doc_id, position)) and is removed everywhere else — C4's
    corpus-level duplicate-span removal at line granularity, the pass
    that strips repeated boilerplate headers/footers a per-document
    filter cannot see.  Lines shorter than `min_chars` are exempt
    (navigation crumbs and list bullets repeat legitimately; C4 guards
    the same way by deduping only three-sentence spans).

    Scale shape — deliberately NO window over the line key: the keeper
    per line is `min(struct(doc_id, pos))`, a partial-aggregatable hash
    aggregate, so a boilerplate line shared by millions of documents
    costs one combiner cell instead of one skewed sort partition.  The
    plan is explode -> (line-hash) agg -> join back -> per-doc
    reassembly (sort_array over collected (pos, line) structs).  Line
    identity is the md5 of the line (the exact_dedup convention)."""
    if min_chars < 0:
        raise ValueError("min_chars must be >= 0")
    lines = docs.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    )
    big = lines.filter(F.length("line") >= min_chars).withColumn(
        "__h", F.md5("line")
    )
    keeper = big.groupBy("__h").agg(
        F.min(F.struct("doc_id", "pos")).alias("k"),
        F.count(F.lit(1)).alias("__occ"),
    )
    kept_big = (
        big.join(keeper, "__h")
        .filter(
            (F.col("__occ") == 1)
            | (
                (F.col("doc_id") == F.col("k.doc_id"))
                & (F.col("pos") == F.col("k.pos"))
            )
        )
        .select("doc_id", "pos", "line")
    )
    kept = kept_big.unionByName(
        lines.filter(F.length("line") < min_chars).select(
            "doc_id", "pos", "line"
        )
    )
    out = kept.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("__ls")
    )
    n_lines = docs.select(
        "doc_id", F.size(F.split("text", "\n")).cast("long").alias("__n")
    )
    return (
        n_lines.join(out, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.concat_ws(
                    "\n", F.transform("__ls", lambda s: s.getField("line"))
                ),
                F.lit(""),
            ).alias("text"),
            (
                F.col("__n") - F.coalesce(F.size("__ls"), F.lit(0)).cast("long")
            ).alias("n_removed"),
        )
    )


def _doc_feature_slots(
    docs: DataFrame, num_buckets: int, bigrams: bool
) -> DataFrame:
    """(doc_id, __n, slot) — one exploded row per feature occurrence:
    lowercased word unigrams (plus word bigrams when asked, fastText's
    recipe) hashed into `num_buckets` slots with the engine-portable md5
    slot hash.  The SHARED feature map of classifier inference
    (`hashed_classifier_scores`) and training
    (`pipeline/train.train_quality_classifier`) — weights transfer
    between them only because both sides hash identically."""
    wa = docs.select(
        "doc_id",
        F.expr(f"array_remove(split(lower(text), '{WORD_RE}'), '')").alias(
            "wa"
        ),
    )
    feats = F.col("wa")
    if bigrams:
        # explicit empty when size < 2: sequence(1, 0) would run BACKWARD
        # in Spark (negative default step), not empty like generate_series
        bi = F.when(
            F.size("wa") >= 2,
            F.expr(
                "transform(sequence(1, size(wa) - 1),"
                " i -> concat_ws(' ', slice(wa, i, 2)))"
            ),
        ).otherwise(F.expr("array()"))
        feats = F.concat(F.col("wa"), bi)
    d = wa.select(
        "doc_id", feats.alias("__f"), F.size(feats).alias("__n")
    ).select("doc_id", "__n", F.explode("__f").alias("tok"))
    slot = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 7), 16, 10).cast("long")
        % num_buckets
    )
    return d.withColumn("slot", slot).drop("tok")


def hashed_classifier_scores(
    docs: DataFrame,
    weights,
    bias: float = 0.0,
    num_buckets: int = 1 << 18,
    bigrams: bool = False,
) -> DataFrame:
    """(doc_id, score, prob) — linear text-classifier INFERENCE with the
    hashing trick: the fastText-shaped model-based quality filter every
    production pretraining pipeline runs (CCNet/LLaMA-style "does this
    look like reference text" scoring), with the model trained offline
    and only the forward pass on the cluster.

    Features are lowercased [a-z0-9]+ word unigrams (plus word bigrams
    when `bigrams=True`, fastText's default recipe) hashed into
    `num_buckets` slots with the engine-portable md5 slot hash
    (conv(substring(md5(tok),1,7)) % num_buckets — the same arithmetic
    the DuckDB oracle runs).  The score is fastText's mean-of-features
    linear form, and prob its sigmoid:

        score(doc) = bias + (1 / n_feats) * sum over features f of w[slot(f)]
        prob(doc)  = 1 / (1 + exp(-score))

    Tokens whose slot has no weight contribute 0; docs with no features
    score exactly `bias`.

    `weights` is a (slot long, weight double) DataFrame or a small
    {slot: weight} dict.  Scale shape: the model is KB–MB while the
    corpus is the 100-TB side, so the weight table is BROADCAST into the
    token probe (map-side lookup, no shuffle of the corpus by slot); the
    only shuffle is the per-doc partial/final sum — the bm25_scores tf
    shape.  No Python runs anywhere."""
    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    spark = docs.sparkSession
    if isinstance(weights, dict):
        weights = spark.createDataFrame(
            [(int(s), float(w)) for s, w in weights.items()],
            "slot long, weight double",
        )
    d = _doc_feature_slots(docs, num_buckets, bigrams)
    # INNER join: tokens missing from the model contribute 0, so only
    # HIT rows (the model-vocabulary fraction of the token stream) reach
    # the per-doc aggregation; __n rides the exploded rows so the corpus
    # is tokenized exactly ONCE (a __n side-branch would re-split every
    # doc — measured slower than the hit savings at 10M docs).  No-hit
    # and no-feature docs come back through the cheap doc_id spine.
    hits = (
        d.join(F.broadcast(weights), "slot")
        .groupBy("doc_id")
        .agg(
            (F.lit(float(bias)) + F.sum("weight") / F.first("__n")).alias(
                "score"
            )
        )
    )
    score = F.coalesce("score", F.lit(float(bias)))
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            score.alias("score"),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-score))).alias("prob"),
        )
    )


def repetition_signals(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition / boilerplate signals per document
    (Rae et al. 2021 §A1.1 quality filters, public spec):

      dup_line_frac       1 - distinct_lines / lines
      dup_line_char_frac  chars living in lines that occur more than once
      top_word_frac       share of word occurrences taken by the most
                          frequent word
      top_bigram_frac     same for word 2-grams

    Shape: ONE scan of the corpus.  Lines, words and word-2-grams are
    tagged and concatenated into a single token array in one projection,
    exploded once, counted by (doc_id, kind, token), reduced to per-
    (doc_id, kind) stats, and pivoted back to columns with a conditional
    aggregation — so the text column is read once, not once per signal.
    Every shuffle is keyed by (doc_id, ...) — no corpus-wide hot key, so
    the plan is embarrassingly parallel at 100 TB.  Docs with no
    lines/words keep a row (left join from the doc spine; the spine scan
    prunes to the doc_id column only) with zeroed signals.
    """
    # project the split arrays ONCE — inlining the split expression inside
    # the bigram lambda would re-evaluate it per element (O(len^2)/doc)
    pre = docs.select(
        "doc_id",
        F.array_remove(F.split(F.col("text"), "\n"), "").alias("la"),
        F.expr(f"array_remove(split(lower(text), '{WORD_RE}'), '')").alias("wa"),
    )
    bigrams_sql = (
        "CASE WHEN size(wa) >= 2 THEN "
        "transform(sequence(1, size(wa) - 1),"
        " i -> concat(element_at(wa, i), ' ', element_at(wa, i + 1)))"
        " ELSE array() END"
    )
    tagged = F.concat(
        F.transform(F.col("la"), lambda x: F.struct(F.lit("L").alias("kind"), x.alias("tok"))),
        F.transform(F.col("wa"), lambda x: F.struct(F.lit("W").alias("kind"), x.alias("tok"))),
        F.transform(
            F.expr(bigrams_sql).cast("array<string>"),
            lambda x: F.struct(F.lit("B").alias("kind"), x.alias("tok")),
        ),
    )
    toks = pre.select("doc_id", F.explode(tagged).alias("t")).select(
        "doc_id", F.col("t.kind").alias("kind"), F.col("t.tok").alias("tok")
    )
    stats = (
        toks.groupBy("doc_id", "kind", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id", "kind")
        .agg(
            F.sum("cnt").alias("n"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.length("tok") * F.col("cnt")).alias("tot_chars"),
            F.sum(
                F.when(F.col("cnt") > 1, F.length("tok") * F.col("cnt")).otherwise(0)
            ).alias("dup_chars"),
            F.max("cnt").alias("top_cnt"),
        )
    )

    def _k(kind, col):
        return F.max(F.when(F.col("kind") == kind, F.col(col)))

    pivoted = stats.groupBy("doc_id").agg(
        _k("L", "n").alias("n_lines"),
        _k("L", "n_distinct").alias("n_distinct"),
        _k("L", "tot_chars").alias("tot_chars"),
        _k("L", "dup_chars").alias("dup_chars"),
        (_k("W", "top_cnt") / _k("W", "n")).alias("top_word_frac"),
        (_k("B", "top_cnt") / _k("B", "n")).alias("top_bigram_frac"),
    )

    return (
        docs.select("doc_id")
        .join(pivoted, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1 - F.col("n_distinct") / F.col("n_lines"), F.lit(0.0)), 6
            ).alias("dup_line_frac"),
            F.round(
                F.coalesce(F.col("dup_chars") / F.col("tot_chars"), F.lit(0.0)), 6
            ).alias("dup_line_char_frac"),
            F.round(F.coalesce("top_word_frac", F.lit(0.0)), 6).alias("top_word_frac"),
            F.round(F.coalesce("top_bigram_frac", F.lit(0.0)), 6).alias(
                "top_bigram_frac"
            ),
        )
    )


def char_ngram_lm_scores(docs: DataFrame, n: int = 3) -> DataFrame:
    """Perplexity-proxy quality score: a character n-gram unigram LM is
    trained on the corpus itself (count / total over all n-gram
    occurrences), then every document is scored by the mean log-probability
    of its n-grams — the cheap stand-in for the KenLM-style perplexity
    filter in public pipeline recipes (CCNet, Dolma).

    Two aggregation stages: (1) model = groupBy(gram).count() over the
    exploded occurrences — vocab-bounded output (|charset|^n rows), tiny
    next to the corpus; (2) score = occurrences ⋈ model (vocab-sized build
    side, AQE broadcasts it) -> groupBy(doc_id).avg.  Zero-gram docs
    (shorter than n after normalization) keep a row with n_grams = 0 and
    NULL score."""
    # project the normalized text ONCE before the per-position lambda —
    # inlining the regexp_replace inside the transform re-evaluates it per
    # window, turning the gram pass O(len^2) per doc (measured 3x slower
    # end-to-end at 100k docs)
    norm = docs.select(
        "doc_id", F.regexp_replace(F.lower(F.col("text")), "\\s+", " ").alias("nt")
    )
    grams_expr = F.when(
        F.length("nt") >= n,
        F.expr(f"transform(sequence(1, length(nt) - {n - 1}), i -> substring(nt, i, {n}))"),
    ).otherwise(F.array().cast("array<string>"))
    # the gram ARRAY projection is materialized once (normalize + per-
    # position substring is the expensive stage, and the exploded stream
    # is consumed by both the model aggregation and the scoring join);
    # the model is materialized too — it is vocab-bounded (|charset|^n
    # rows) yet its two consumers (the total aggregate and the join
    # build) would each re-run the full corpus aggregation otherwise.
    from pyspark.storagelevel import StorageLevel

    gsets = norm.select("doc_id", grams_expr.alias("__gs")).localCheckpoint(
        eager=True, storageLevel=StorageLevel.DISK_ONLY
    )
    occ = gsets.select("doc_id", F.explode("__gs").alias("gram"))
    model = occ.groupBy("gram").agg(
        F.count(F.lit(1)).alias("cnt")
    ).localCheckpoint()
    total = model.agg(F.sum("cnt").alias("total"))
    scored = (
        occ.join(model, "gram")
        .crossJoin(total)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.avg(F.log(F.col("cnt") / F.col("total"))).alias("avg_logp"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.round("avg_logp", 6).alias("avg_logp"),
        )
    )


# PII surface patterns — deliberately conservative, identical semantics
# under Java regex (Spark) and RE2 (DuckDB oracle): character classes,
# \b, bounded repetition only.
PII_PATTERNS = {
    "emails": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "urls": r"https?://[^\s]+",
    "phones": r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count_exprs() -> dict[str, Column]:
    """Per-pattern PII counts as row-local columns."""
    return {
        f"n_{k}": F.regexp_count("text", F.lit(p)).cast("long")
        for k, p in PII_PATTERNS.items()
    }


def pii_signals(docs: DataFrame) -> DataFrame:
    """(doc_id, n_emails, n_urls, n_phones, n_ipv4, has_pii) — counts of
    PII-shaped substrings, the screening signal a curation pipeline uses
    to route documents to scrubbing/drop.  Pure regexp_count expressions:
    one projection over the scan, zero shuffle, trivially parallel at
    100 TB.  (Counting, not extraction: the signal decides routing; the
    scrub itself is a downstream regexp_replace pass.)"""
    out = docs.select(
        "doc_id", *[c.alias(n) for n, c in pii_count_exprs().items()]
    )
    total = None
    for k in PII_PATTERNS:
        c = F.col(f"n_{k}")
        total = c if total is None else total + c
    return out.withColumn("has_pii", total > 0)


def corpus_quality_summary(docs: DataFrame) -> DataFrame:
    """(lang, n_docs, q25, q50, q95, avg_words) — the corpus-analytics
    rollup a curation run reports per language: exact interpolated
    quality quantiles (Spark `percentile` == DuckDB `quantile_cont`
    semantics) and mean doc length.  One quality pass + one groupBy on
    the tiny lang key; at 100 TB swap `percentile` for
    `approx_percentile` (t-digest) if the per-group sort ever shows up —
    the group cardinality (languages) is small, so each group's exact
    quantile is a single-task sort of its doc count."""
    qs = quality_scores(docs).join(docs.select("doc_id", "lang"), "doc_id")
    return qs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.expr("percentile(quality, 0.25)"), 6).alias("q25"),
        F.round(F.expr("percentile(quality, 0.5)"), 6).alias("q50"),
        F.round(F.expr("percentile(quality, 0.95)"), 6).alias("q95"),
        F.round(F.avg("n_words"), 6).alias("avg_words"),
    )


def top_ngrams(
    docs: DataFrame, n: int = 1, k: int = 1000, min_df: int = 1
) -> DataFrame:
    """(gram, tf, df) — the k most frequent word n-grams with their corpus
    term frequency and document frequency: the vocabulary-builder pass a
    tokenizer-training / stopword-mining step runs over the corpus.

    Scale shape: ONE explode of per-doc gram lists (occurrences, not
    distinct — tf needs multiplicity) into a single (gram) aggregation
    with map-side partial combine; df rides the same aggregation as
    count(distinct doc_id) per gram, so no second pass.  The top-k is
    TakeOrderedAndProject (bounded heaps per partition + driver merge,
    never a full sort); ties at the boundary break deterministically by
    gram text.  min_df cuts hapax noise before the heap."""
    # explode_outer + null-gram filter: a plain explode infers a
    # size()>0 row filter that re-evaluates the whole gram transform
    # below the exchange (see dedup.word_ngrams); the outer explode
    # turns the empty arrays (docs shorter than n) into one null-gram
    # row each, dropped by a filter on the GENERATED column, which
    # cannot be pushed below the generator.
    from redistimeseries_spark.pipeline.dedup import _widen

    grams = (
        _widen(docs)
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.expr(f"array_remove(split(lower(text), '{WORD_RE}'), '')").alias("wa"),
        )
        .select(
            "doc_id",
            F.expr(
                f"CASE WHEN size(wa) >= {n} THEN transform("
                f"sequence(1, size(wa) - {n - 1}),"
                f" i -> concat_ws(' ', slice(wa, i, {n}))) "
                f"ELSE array() END"
            ).alias("__gs"),
        )
        .select("doc_id", F.explode_outer("__gs").alias("gram"))
        .filter(F.col("gram").isNotNull())
    )
    agg = grams.groupBy("gram").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("doc_id").alias("df"),
    )
    return (
        agg.filter(F.col("df") >= min_df)
        .orderBy(F.desc("tf"), "gram")
        .limit(k)
    )
