"""Sanity semantics for the training-data pipeline operators (the gate
covers oracle equality; these check *operator* behavior on planted cases)."""

import pytest
from pyspark.sql import functions as F

from redistimeseries_spark.pipeline.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from redistimeseries_spark.pipeline.similarity import cosine_topk
from redistimeseries_spark.pipeline.text import lang_scores, token_counts


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (1, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (2, "completely different content about spark engines and parquet files"),
        (3, "the quick brown fox jumps over the lazy dog and runs away fast"),  # dup of 1
        (4, "the quick brown fox jumps over the lazy dog and walks away fast"),  # near-dup of 1
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    out = {r.keeper: r.n_copies for r in exact_dedup(docs).collect()}
    assert out[1] == 2 and out[2] == 1 and out[4] == 1


def test_minhash_finds_near_dup(docs):
    pairs = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 3) in pairs  # exact dup always collides
    assert (1, 4) in pairs or (3, 4) in pairs  # near-dup shares bands
    assert (1, 2) not in pairs


def test_simhash_near_dup_close(docs):
    h = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert h[1] == h[3]
    ham_14 = bin(h[1] ^ h[4]).count("1")
    ham_12 = bin(h[1] ^ h[2]).count("1")
    assert ham_14 < ham_12


def test_jaccard_exact(docs):
    out = {(r.doc_a, r.doc_b): r.jaccard for r in
           ngram_jaccard_pairs(docs, n=3, threshold=0.1).collect()}
    assert out[(1, 3)] == 1.0
    assert 0.1 <= out[(1, 4)] < 1.0
    assert (1, 2) not in out


def test_cosine_topk_finds_twin(spark):
    rows = [(0, [1.0, 0.0, 0.0]), (1, [0.99, 0.1, 0.0]), (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = [r.vec_id for r in cosine_topk(emb, 0, 2).collect()]
    assert out == [1, 2]


def test_lang_id_english(spark):
    d = spark.createDataFrame(
        [(1, "the cat and the dog of the house is to be found"),
         (2, "le chat et la maison est dans les arbres"),
         (3, "zzz qqq www")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang_pred for r in lang_scores(d).collect()}
    assert out[1] == "en" and out[2] == "fr" and out[3] == "unknown"


def test_token_counts(spark):
    d = spark.createDataFrame([(1, "  a bb  ccc   dddd ")], "doc_id long, text string")
    r = token_counts(d).collect()[0]
    assert r.ws_tokens == 4
    assert r.bpe_tokens_est == 3  # ceil(10/4)


def test_multimodal_stub_raises(spark):
    from redistimeseries_spark.pipeline.multimodal import attach_payload, extract_features

    d = spark.createDataFrame([(1, "abc", "en", "s")], "doc_id long, text string, lang string, source string")
    with pytest.raises(Exception):
        extract_features(attach_payload(d), use_real_decoder=True).collect()
    ok = extract_features(attach_payload(d)).collect()[0]
    assert ok.n_bytes == 3 and ok.first_byte == 97 and ok.last_byte == 99


def test_connected_components_transitive(spark):
    # chain 1-2-3 (no direct 1-3 pair), chain 10-11, singleton edge 20-21:
    # components collapse transitively to the min id
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_long_chain(spark):
    # diameter > 2 exercises the iteration-until-fixpoint path
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert got == {i: 1 for i in range(1, 10)}


def test_ann_recall_vs_brute_force(spark):
    """IVF probes the nprobe nearest cells -> full recall on the fixture;
    single-probe sign-LSH is the recall floor (random embeddings are the
    LSH worst case) and multi-probe (Hamming<=2 buckets) recovers part of
    it — recall must be monotone in the probe radius."""
    from redistimeseries_spark.pipeline.similarity import ivf_topk, lsh_topk
    from redistimeseries_spark.store import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    brute = {r.vec_id for r in cosine_topk(emb, 0, 10).collect()}
    ivf = {r.vec_id for r in ivf_topk(emb, 0, 10, ncent=8, nprobe=4).collect()}
    assert len(brute & ivf) / 10 >= 0.9
    l0 = {r.vec_id for r in lsh_topk(emb, 0, 10).collect()}
    l2 = {r.vec_id for r in lsh_topk(emb, 0, 10, multiprobe=2).collect()}
    r0, r2 = len(brute & l0) / 10, len(brute & l2) / 10
    assert r2 >= r0 and r2 >= 0.2
