"""Dataset-curation operators: deterministic splits and benchmark
decontamination.

Both are map-side or broadcast-join passes — nothing here shuffles the
corpus:

  * hash_split      — split assignment is a pure expression over md5 of
                      the doc id: reproducible across runs/engines
                      (unlike randomSplit, which depends on partitioning),
                      stable under corpus growth (a doc's split never
                      changes when other docs arrive), and zero-shuffle.
  * decontaminate   — training docs sharing any word n-gram with an
                      evaluation set are flagged.  The eval side is small
                      by definition (benchmarks are KBs-to-MBs against a
                      100 TB corpus), so its distinct gram set broadcasts;
                      the corpus side stays a map-side hash-join probe —
                      no corpus shuffle, no all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redistimeseries_spark.materialize import materialize
from redistimeseries_spark.pipeline.dedup import _widen, word_ngrams

# md5-prefix arithmetic identical in Spark SQL and DuckDB (same trick as
# the minhash signatures in pipeline/dedup.py)
_HASH_BUCKETS = 10_000


def hash_split(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket, split) — deterministic split assignment.

    bucket = md5(doc_id) mod 10000; splits claim contiguous bucket ranges
    in the given order, so fractions {"train": .9, "val": .05, "test": .05}
    map to [0, 9000), [9000, 9500), [9500, 10000).  Assignment depends
    only on the doc id — re-running, repartitioning, or growing the
    corpus never reassigns an existing doc.
    """
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10)
        .cast("long")
        % _HASH_BUCKETS
    )
    out = docs.select(F.col(id_col).alias("doc_id"), bucket.alias("bucket"))
    expr = None
    lo = 0
    for name, frac in fractions.items():
        hi = lo + int(round(frac * _HASH_BUCKETS))
        cond = F.col("bucket") < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo = hi
    return out.withColumn("split", expr)


def canonical_url(col) -> "F.Column":
    """Canonical form of a URL column — the normalization that makes
    crawl dedup-by-URL work (the same page arrives as HTTP://Host/a/,
    http://host:80/a?utm_source=x#top, ...):

      1. fragment stripped
      2. tracking params removed (utm_*, fbclid, gclid), separators fixed
      3. scheme + authority lowercased (path/query case is significant)
      4. default ports :80 (http) / :443 (https) dropped
      5. trailing path slashes stripped (at the end and before the query)

    Pure regexp/string expression work (anchors, classes, alternation —
    the subset Java regex and RE2 agree on), so the DuckDB oracle
    computes the identical canonical string."""
    u = F.regexp_replace(col, "#.*$", "")
    # Each tracking param must be ANCHORED to a preceding ?/& (else a
    # param merely ENDING in a tracking name, e.g. xfbclid, is excised
    # mid-token).  Lookbehind is outside the Java/RE2-shared subset, so
    # the separator is kept via $1 and separator runs collapsed after —
    # replace-all consumes each param's own leading ?/&, so consecutive
    # tracking params all match in one pass.
    u = F.regexp_replace(u, "([?&])(utm_[a-z_]+|fbclid|gclid)=[^&]*", "$1")
    u = F.regexp_replace(u, "([?&])&+", "$1")
    u = F.regexp_replace(u, "[?&]$", "")
    auth = F.regexp_extract(u, "^([^:/?#]+://[^/?#]*)", 1)
    # lowercase ONLY scheme://authority; keep path+query byte-exact
    rest = F.substring(u, F.length(auth) + 1, F.lit(1 << 30))
    u = F.concat(F.lower(auth), rest)
    u = F.regexp_replace(u, "^(http://[^:/?#]+):80(/|$)", "$1$2")
    u = F.regexp_replace(u, "^(https://[^:/?#]+):443(/|$)", "$1$2")
    u = F.regexp_replace(u, "/+[?]", "?")
    return F.regexp_replace(u, "/+$", "")


def url_dedup(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """(doc_id, curl, n_dupes) — one row per CANONICAL url, keeping the
    smallest doc_id (crawl-side exact dedup, the cheapest and
    highest-yield dedup pass a web corpus gets).  One projection + one
    (curl) hash aggregate with map-side partials — the exact_dedup
    shape."""
    return (
        docs.select("doc_id", canonical_url(F.col(url_col)).alias("curl"))
        .groupBy("curl")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
        .select("doc_id", "curl", "n_dupes")
    )


def decontaminate(
    docs: DataFrame, eval_docs: DataFrame, n: int = 5, hashed_grams: bool = True
) -> DataFrame:
    """(doc_id, contaminated_grams, contaminated) — one row per training
    doc; contaminated_grams counts the doc's distinct word n-grams that
    also appear anywhere in the evaluation set (n-gram–overlap
    decontamination, the standard pre-training hygiene pass).

    Scale shape: the eval gram vocabulary is broadcast (eval sets are
    tiny relative to the corpus — the hint is the semantics here, not a
    size guess) and the corpus grams probe it map-side; the only shuffle
    is the per-doc count aggregation, partial-agg first.

    `hashed_grams` (default) projects both sides' grams to xxhash64
    before the probe: the broadcast hash table holds 8-byte keys instead
    of n-word strings and every corpus-side probe hashes a long, not a
    string.  The count changes only if two DIFFERENT grams collide in
    64 bits (~1e-15 for benchmark-sized gram sets — the
    ngram_jaccard_verify tolerance); hashed_grams=False keeps the
    exact-string probe.
    """
    g = word_ngrams(_widen(docs), n)
    ge = word_ngrams(eval_docs, n).select("gram").distinct()
    if hashed_grams:
        g = g.select("doc_id", F.xxhash64("gram").alias("gram"))
        ge = ge.select(F.xxhash64("gram").alias("gram")).distinct()
    hits = (
        g.join(F.broadcast(ge), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("contaminated_grams"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("contaminated_grams", F.lit(0)).alias("contaminated_grams"),
            (F.coalesce("contaminated_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# benchmark suites are small by construction; past this many eval
# (doc, gram) ROWS — the table actually broadcast, not the doc count
# that merely generates it — the broadcast stops being obviously safe
# (~2M rows ≈ low-hundreds of MB with gram strings) and the join
# strategy is left to AQE (ADVICE r7)
EVAL_BROADCAST_MAX_GRAMS = 2_000_000


def eval_contamination_report(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    broadcast_eval: bool | None = None,
    hashed_grams: bool = True,
) -> DataFrame:
    """(doc_id, n_grams, contaminated_grams, contamination_frac) — one
    row per EVAL doc: how many of its distinct word n-grams appear
    anywhere in the TRAINING corpus, and the fraction.  The flip side of
    `decontaminate`: that one tells you which training docs to drop;
    this one tells you which BENCHMARK items are already compromised
    (the number an eval-integrity audit reports before trusting a
    score).

    Scale shape: the eval gram table is the small side — broadcast into
    the corpus gram stream (one map-side join over the corpus, the
    decontaminate scan) while the eval side is benchmark-sized; hot
    grams (boilerplate shared by millions of training docs) collapse in
    the map-side PARTIAL of the (eval doc, gram) distinct before any
    shuffle, so the aggregation never sees the corpus-side multiplicity.

    `broadcast_eval` guards the broadcast (ADVICE r7: an unexpectedly
    large eval corpus would blow the driver/broadcast limit): None
    (default) probes the (doc, gram) table that is actually shipped —
    a BOUNDED limit-count over the eval side only, never the corpus —
    and falls back to a plain join (AQE picks the strategy) past
    EVAL_BROADCAST_MAX_GRAMS rows; True/False force the choice when the
    caller already knows the size.  Counting the GRAM rows rather than
    the docs matters: 90k long documents are few docs but a multi-GB
    gram table.

    `hashed_grams` (default) projects both sides' grams to xxhash64 —
    the decontaminate tradeoff: 8-byte broadcast keys and long-hash
    probes, counts unchanged unless two different grams collide in 64
    bits (~1e-15); per-doc n_grams counts rows, which hashing never
    changes."""
    ge_raw = word_ngrams(eval_docs, n)
    if hashed_grams:
        ge_raw = ge_raw.select("doc_id", F.xxhash64("gram").alias("gram"))
    # the size probe runs BEFORE any materialization: limit-count is
    # bounded on the lazy frame, whereas an eager checkpoint would
    # execute and store the ENTIRE (doc, gram) table first — in the
    # exact oversized case the guard exists for (ADVICE r11).
    if broadcast_eval is None:
        cap = EVAL_BROADCAST_MAX_GRAMS
        broadcast_eval = ge_raw.limit(cap + 1).count() <= cap
    # (eval doc_id, gram), per-doc distinct — materialized once: it is
    # executed by the per-doc sizes aggregate AND the broadcast build
    # (two runs of the eval-side tokenize + explode otherwise;
    # re-aliased subtrees defeat exchange reuse).  Confirmed-small
    # tables checkpoint eagerly; the oversized fallback defers the
    # checkpoint to first use so nothing multi-GB is staged before the
    # plan needs it.  DISK_ONLY keeps the blocks out of executor
    # storage memory either way.
    if broadcast_eval:
        ge = materialize(ge_raw)
    else:
        from pyspark.storagelevel import StorageLevel

        ge = ge_raw.localCheckpoint(
            eager=False, storageLevel=StorageLevel.DISK_ONLY
        )
    sizes = ge.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    gt = word_ngrams(_widen(docs), n).select("gram")
    if hashed_grams:
        gt = gt.select(F.xxhash64("gram").alias("gram"))
    hits = (
        gt.join(F.broadcast(ge) if broadcast_eval else ge, "gram")
        .select("doc_id", "gram")
        .dropDuplicates(["doc_id", "gram"])  # partial-agg collapses hot grams
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("contaminated_grams"))
    )
    return (
        eval_docs.select("doc_id")
        .join(sizes, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("contaminated_grams", F.lit(0)).alias(
                "contaminated_grams"
            ),
            F.round(
                F.coalesce("contaminated_grams", F.lit(0))
                / F.nullif(F.coalesce("n_grams", F.lit(0)), F.lit(0)),
                6,
            ).alias("contamination_frac"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    stratum_col: str = "lang",
    n: int = 50,
    id_col: str = "doc_id",
    safety: int = 8,
) -> DataFrame:
    """(stratum, doc_id, rn) — exactly min(n, |stratum|) docs per stratum,
    chosen deterministically: the n smallest md5(doc_id) hashes.  The
    balanced-sampling pass a training-data pipeline runs per language /
    source; hash order makes the draw uniform, reproducible across
    engines, and stable under repartitioning (unlike df.sampleBy).

    Scale shape: the naive `row_number over (partition by stratum)` sorts
    every stratum's full population through one task — a single-reducer
    bottleneck when one language holds half of 100 TB.  Instead:
      1. count each stratum (partial-agg shuffle, |strata| rows),
      2. keep rows whose 32-bit hash prefix falls below `safety * n / cnt`
         — a map-side cut leaving ~safety*n rows per stratum,
      3. run the exact window on the survivors only.
    The cut keeps the true top-n with overwhelming probability (Chernoff:
    P[< n of cnt rows under a safety*n/cnt cut] < e^{-n(safety-1)^2/2s});
    a per-stratum survivor count (|strata|-row collect) verifies, and any
    undershoot falls back to the exact unfiltered window, so the result is
    ALWAYS exact."""
    from pyspark.sql import Window

    h = F.md5(F.col(id_col).cast("string"))
    d = docs.select(
        F.col(stratum_col).alias("stratum"), F.col(id_col).alias("doc_id")
    ).withColumn("__h", h)
    # 32-bit uniform from the hash prefix, same arithmetic as hash_split
    u32 = F.conv(F.substring("__h", 1, 8), 16, 10).cast("long")
    counts = d.groupBy("stratum").agg(F.count(F.lit(1)).alias("__cnt"))
    # compare as doubles: `u32 * cnt <= safety*n*2^32` overflows 64-bit
    # longs once a stratum exceeds ~2.1e9 rows (ANSI mode throws; legacy
    # wraps and silently un-cuts half the stratum).  The double's 53-bit
    # mantissa only blurs the threshold by a few ulps — harmless
    # over-admission; the exact window below decides membership.
    cut = d.join(F.broadcast(counts), "stratum").filter(
        u32.cast("double") <= F.lit(float(safety * n) * 2.0**32) / F.col("__cnt")
    )
    survivors = {
        r["stratum"]: r["ok"]
        for r in cut.groupBy("stratum")
        .agg((F.count(F.lit(1)) >= F.least(F.min("__cnt"), F.lit(n))).alias("ok"))
        .collect()
    }
    if not all(survivors.values()) or len(survivors) < counts.count():
        cut = d  # fall back to the exact full window (never at uniform hash)
    w = Window.partitionBy("stratum").orderBy("__h", "doc_id")
    return (
        cut.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= n)
        .select("stratum", "doc_id", "rn")
    )


def mixture_targets(weights: dict[str, float], total_n: int) -> dict[str, int]:
    """Deterministic largest-remainder allocation of `total_n` slots to
    strata by weight (Hare quota / Hamilton's method): floor every quota,
    then hand the leftover slots to the largest fractional remainders,
    ties broken by stratum name.  Pure arithmetic — the oracle calls the
    same function, so allocation can never drift between engines."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")
    tot = sum(weights.values())
    if abs(tot - 1.0) > 1e-9:
        raise ValueError("weights must sum to 1")
    quota = {s: w * total_n for s, w in weights.items()}
    alloc = {s: int(quota[s]) for s in weights}
    leftover = total_n - sum(alloc.values())
    by_rem = sorted(weights, key=lambda s: (-(quota[s] - alloc[s]), s))
    for s in by_rem[:leftover]:
        alloc[s] += 1
    return alloc


def temperature_weights(
    counts: dict[str, int], temperature: float
) -> dict[str, float]:
    """Temperature-smoothed mixture weights from stratum counts:
    q_s ∝ (n_s / N)^(1/T), normalized — the multilingual-sampling rule
    (XLM-R / mT5 style): T=1 keeps natural proportions, T→∞ approaches
    uniform, T<1 sharpens toward the head.  Feed the result to
    `mixture_sample` / `mixture_targets` for the actual draw:

        counts = {r.stratum: r.n for r in
                  docs.groupBy("lang").agg(count("*")).collect()}
        mixture_sample(docs, temperature_weights(counts, T=3.0), total_n,
                       stratum_col="lang")

    Pure driver arithmetic over the |strata|-row count table (the one
    aggregate is the only corpus pass), deterministic given counts.
    Empty strata (n=0) get weight 0."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    if not counts:
        raise ValueError("counts must be non-empty")
    if any(n < 0 for n in counts.values()):
        raise ValueError("counts must be non-negative")
    total = sum(counts.values())
    if total == 0:
        raise ValueError("counts must not all be zero")
    q = {s: (n / total) ** (1.0 / temperature) for s, n in counts.items()}
    z = sum(q.values())
    return {s: v / z for s, v in q.items()}


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    total_n: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    safety: int = 8,
) -> DataFrame:
    """(stratum, doc_id, rn) — sample to a TARGET MIXTURE: stratum s gets
    exactly min(target_s, |s|) docs where target_s is the
    largest-remainder allocation of total_n by `weights` (the data-mixing
    pass that hits a recipe like 50% web / 30% code / 20% books).  Docs
    whose stratum has no weight are excluded.  Same deterministic
    hash-order draw and the same count -> hash-cut -> verified-window
    scale shape as `stratified_sample` (one cut fraction per stratum,
    safety * target_s / count), so no stratum ever sorts its full
    population through one task."""
    from pyspark.sql import Window

    targets = mixture_targets(weights, total_n)
    spark = docs.sparkSession
    # target-0 strata are dropped up front: their rows are filtered by
    # rn <= 0 anyway, but keeping them would give them cut threshold 0,
    # zero survivors, and so a guaranteed miss in the survivors check —
    # silently defeating the hash-cut and falling back to the exact
    # (full-population window sort) path on every call
    lim = F.broadcast(
        spark.createDataFrame(
            [(s, n) for s, n in targets.items() if n > 0],
            "stratum string, __target long",
        )
    )
    h = F.md5(F.col(id_col).cast("string"))
    d = (
        docs.select(
            F.col(stratum_col).alias("stratum"), F.col(id_col).alias("doc_id")
        )
        .withColumn("__h", h)
        .join(lim, "stratum")  # drops unweighted strata
    )
    u32 = F.conv(F.substring("__h", 1, 8), 16, 10).cast("long")
    counts = d.groupBy("stratum").agg(F.count(F.lit(1)).alias("__cnt"))
    # double-compare for the same 64-bit-overflow reason as
    # stratified_sample; over-admission is harmless, the window decides
    cut = d.join(F.broadcast(counts), "stratum").filter(
        u32.cast("double")
        <= F.lit(float(safety) * 2.0**32)
        * F.col("__target").cast("double")
        / F.col("__cnt")
    )
    survivors = {
        r["stratum"]: r["ok"]
        for r in cut.groupBy("stratum")
        .agg(
            (
                F.count(F.lit(1))
                >= F.least(F.min("__cnt"), F.min("__target"))
            ).alias("ok")
        )
        .collect()
    }
    if not all(survivors.values()) or len(survivors) < counts.count():
        cut = d  # exact fallback (never taken at uniform hash)
    w = Window.partitionBy("stratum").orderBy("__h", "doc_id")
    return (
        cut.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= F.col("__target"))
        .select("stratum", "doc_id", "rn")
    )


def curation_filter(
    docs: DataFrame,
    min_words: int = 5,
    min_quality: float = 0.3,
    langs: tuple[str, ...] = ("en",),
    max_dup_line_frac: float = 0.3,
    max_top_bigram_frac: float = 0.5,
    allow_pii: bool = False,
) -> DataFrame:
    """(doc_id, keep, reasons) — the composed keep/drop decision a
    pre-training pipeline applies: quality floor, language allowlist,
    repetition ceilings, PII screen.  Each signal is the already-tested
    operator; the composition is doc_id-keyed joins of per-doc scalar
    tables — no new shuffle shape, and Catalyst collapses the shared
    documents scans per branch.  `reasons` lists the failed checks in a
    fixed order (empty string = kept) so drops are auditable."""
    from redistimeseries_spark.pipeline.text import (
        lang_pred_expr,
        pii_count_exprs,
        quality_exprs,
        repetition_signals,
    )

    # quality, language, and PII are ROW-LOCAL — one projection over the
    # scan, no joins (a 4-way doc_id join of the separate signal tables
    # measured ~4x slower at 100k docs: each branch re-derived the corpus
    # and shuffled into its own SMJ).  Only the repetition signals
    # aggregate, so only they join back.
    qe = quality_exprs()
    pii_total = None
    for c in pii_count_exprs().values():
        pii_total = c if pii_total is None else pii_total + c
    base = docs.select(
        "doc_id",
        qe["n_words"].alias("n_words"),
        qe["quality"].alias("quality"),
        lang_pred_expr().alias("lang_pred"),
        (pii_total > 0).alias("has_pii"),
    )
    r = repetition_signals(docs).select(
        "doc_id", "dup_line_frac", "top_bigram_frac"
    )
    j = base.join(r, "doc_id", "left")
    checks = [
        ("short_doc", F.col("n_words") < min_words),
        ("low_quality", F.col("quality") < min_quality),
        ("bad_lang", ~F.col("lang_pred").isin(*langs)),
        ("repetitive_lines", F.col("dup_line_frac") > max_dup_line_frac),
        ("repetitive_ngrams", F.col("top_bigram_frac") > max_top_bigram_frac),
    ]
    if not allow_pii:
        checks.append(("pii", F.col("has_pii")))
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in checks]
    )
    return j.select(
        "doc_id",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )
