"""SQL surface: expose the store as Spark SQL views plus engine scalar
helpers as SQL UDFs, so the whole query surface is reachable from
`spark.sql(...)` (SURVEY §2.10: the reference's command vocabulary is
closed; ours is that vocabulary *plus* full SQL).

The scalar functions are declarative SQL UDFs (CREATE FUNCTION ... RETURN
<expr>), which Catalyst inlines into the calling plan — they stay inside
whole-stage codegen, unlike Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from redistimeseries_spark.store import TSStore

# bucket(ts) = ts - ((ts - align) mod dur), clamped >= 0
# (CalcBucketStart, src/tsdb.h:88-99)
_TS_BUCKET_SQL = """
CREATE OR REPLACE TEMPORARY FUNCTION ts_bucket(ts BIGINT, dur BIGINT, align BIGINT)
RETURNS BIGINT
RETURN greatest(ts - pmod(ts - align, dur), 0)
"""

# reported bucket ts under BUCKETTIMESTAMP -/~/+
# (src/filter_iterator.c:42-55)
_TS_REPORT_SQL = """
CREATE OR REPLACE TEMPORARY FUNCTION ts_bucket_report(b BIGINT, dur BIGINT, mode STRING)
RETURNS BIGINT
RETURN CASE mode WHEN '~' THEN b + dur DIV 2 WHEN '+' THEN b + dur ELSE b END
"""


def register_sql(spark: SparkSession, store: TSStore, prefix: str = "ts_") -> None:
    """Create temp views `<prefix>samples` / `<prefix>labels` and the
    ts_bucket / ts_bucket_report SQL functions in the session catalog."""
    store.samples.createOrReplaceTempView(f"{prefix}samples")
    store.labels.createOrReplaceTempView(f"{prefix}labels")
    spark.sql(_TS_BUCKET_SQL)
    spark.sql(_TS_REPORT_SQL)


# ---- training-data pipeline vocabulary ------------------------------------
# Scalar document functions as declarative SQL UDFs: Catalyst inlines the
# body at the call site, so `SELECT dl_exact_fp(text) FROM docs` compiles
# to the same whole-stage-codegen expression the DataFrame operators in
# pipeline/text.py build — no Python, no serialization boundary.

_PIPELINE_FN_SQL = [
    # normalized text (the shared canonical form of fingerprints/simhash)
    """CREATE OR REPLACE TEMPORARY FUNCTION dl_norm_text(t STRING)
       RETURNS STRING
       RETURN regexp_replace(lower(t), '\\\\s+', ' ')""",
    # whitespace token count (pipeline/text.token_counts)
    """CREATE OR REPLACE TEMPORARY FUNCTION dl_ws_tokens(t STRING)
       RETURNS BIGINT
       RETURN size(array_remove(split(t, '\\\\s+'), ''))""",
    # BPE-ish subword estimate (chars/4 on non-space chars)
    """CREATE OR REPLACE TEMPORARY FUNCTION dl_bpe_tokens_est(t STRING)
       RETURNS BIGINT
       RETURN CAST(ceil(length(regexp_replace(t, '\\\\s', '')) / 4.0) AS BIGINT)""",
    # exact content fingerprint (pipeline/text.fingerprints)
    """CREATE OR REPLACE TEMPORARY FUNCTION dl_exact_fp(t STRING)
       RETURNS STRING
       RETURN md5(regexp_replace(lower(t), '\\\\s+', ' '))""",
    # deterministic split bucket (pipeline/curation.hash_split)
    """CREATE OR REPLACE TEMPORARY FUNCTION dl_hash_bucket(id BIGINT)
       RETURNS BIGINT
       RETURN CAST(conv(substring(md5(CAST(id AS STRING)), 1, 7), 16, 10) AS BIGINT) % 10000""",
    # distinct char k-shingles (pipeline/dedup.char_shingles).  A scalar
    # SQL UDF body is one expression, so the projected-lowered-text trick
    # is unavailable; lowercasing each k-char WINDOW keeps the work
    # O(len*k) instead of O(len^2) (equal to char_shingles for
    # length-preserving case mappings — all of ASCII)
    """CREATE OR REPLACE TEMPORARY FUNCTION dl_shingles(t STRING, k INT)
       RETURNS ARRAY<STRING>
       COMMENT 'distinct lowercased char k-shingles; equals the DataFrame
         operator char_shingles for length-preserving case mappings (all
         of ASCII) — pass pre-lowercased text for non-ASCII corpora where
         lower() can change length (e.g. Turkish dotted I)'
       RETURN array_distinct(transform(
           sequence(1, greatest(length(t) - k + 1, 1)),
           i -> lower(substring(t, i, k))))""",
    # distinct word n-grams as an array (pipeline/dedup.word_ngram_sets);
    # the word array is bound once via a lambda parameter so split() is
    # not re-evaluated per gram position
    """CREATE OR REPLACE TEMPORARY FUNCTION dl_word_ngrams(t STRING, n INT)
       RETURNS ARRAY<STRING>
       RETURN reduce(
           array(array_remove(split(lower(t), '[^a-z0-9]+'), '')),
           CAST(array() AS ARRAY<STRING>),
           (acc, wa) -> array_distinct(transform(
               sequence(1, greatest(size(wa) - n + 1, 1)),
               i -> concat_ws(' ', slice(wa, i, n)))))""",
    # canonical URL (pipeline/curation.canonical_url); the scrubbed
    # string is bound once via the reduce-lambda trick (dl_word_ngrams)
    # so the fragment/param strip is not re-evaluated per reference
    """CREATE OR REPLACE TEMPORARY FUNCTION dl_canonical_url(u STRING)
       RETURNS STRING
       RETURN reduce(
           array(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(u, '#.*$', ''),
               '([?&])(utm_[a-z_]+|fbclid|gclid)=[^&]*', '$1'),
               '([?&])&+', '$1'),
               '[?&]$', '')),
           CAST('' AS STRING),
           (acc, s) -> regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(
                   concat(
                       lower(regexp_extract(s, '^([^:/?#]+://[^/?#]*)', 1)),
                       substring(s,
                           length(regexp_extract(s, '^([^:/?#]+://[^/?#]*)', 1)) + 1,
                           1073741824)),
                   '^(http://[^:/?#]+):80(/|$)', '$1$2'),
               '^(https://[^:/?#]+):443(/|$)', '$1$2'),
               '/+[?]', '?'),
               '/+$', ''))""",
    # BM25 term weight (pipeline/retrieval.bm25_scores): idf * saturated tf
    """CREATE OR REPLACE TEMPORARY FUNCTION dl_bm25_weight(
           tf BIGINT, df BIGINT, n_docs BIGINT, dl BIGINT, avgdl DOUBLE,
           k1 DOUBLE, b DOUBLE)
       RETURNS DOUBLE
       RETURN ln(1 + (n_docs - df + 0.5) / (df + 0.5))
              * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))""",
]


def register_pipeline_sql(spark: SparkSession, docs=None, emb=None) -> None:
    """Register the dl_* scalar functions (and optional `documents` /
    `embeddings` temp views) so the pipeline vocabulary is reachable from
    `spark.sql(...)` alongside the ts_* surface."""
    for stmt in _PIPELINE_FN_SQL:
        spark.sql(stmt)
    if docs is not None:
        docs.createOrReplaceTempView("documents")
    if emb is not None:
        emb.createOrReplaceTempView("embeddings")
