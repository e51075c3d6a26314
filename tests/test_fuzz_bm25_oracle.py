"""Randomized BM25 differential fuzz vs a DuckDB oracle.

Same strategy as test_fuzz_range_oracle: random specs (corpus shape x
query terms x k1/b parameters), the Spark operator and an independently
written SQL implementation of the same published formula (Robertson's
Okapi BM25 with the BM25+-style non-negative idf), exact compare on
rounded scores.  Corpora draw from a small vocabulary so term collisions
are common, and include empty texts (dl=0 must still count in avgdl) and
punctuation-only docs (tokenize to nothing).

Seeded RNG: every run exercises the same specs (reproducible failures).
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd

from redistimeseries_spark.pipeline.retrieval import bm25_scores, query_terms

VOCAB = [
    "spark", "table", "scan", "query", "join", "merge", "batch", "row",
    "fast", "slow", "data", "key", "value", "window", "agg",
]
N_SPECS = 12

_WORDS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"


def _oracle_sql(terms: list[str], k1: float, b: float) -> str:
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""WITH
        w AS (SELECT doc_id, {_WORDS_SQL} AS wa FROM corpus),
        d AS (SELECT doc_id, len(wa) AS dl, wa FROM w),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM d),
        m AS (SELECT doc_id, dl, t.term FROM d, unnest(wa) AS t(term)
              WHERE t.term IN ({in_list})),
        tf AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
               FROM m GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        s AS (SELECT tf.doc_id,
                     ln(1 + (n_docs - df + 0.5) / (df + 0.5))
                       * (tf * ({k1} + 1))
                       / (tf + {k1} * (1 - {b} + {b} * dl / avgdl)) AS wgt
              FROM tf JOIN df USING (term), stats)
        SELECT doc_id, round(sum(wgt), 6) AS score FROM s GROUP BY doc_id"""


def test_fuzz_bm25_vs_duckdb(spark):
    rng = random.Random(1307)
    con = duckdb.connect()
    for spec in range(N_SPECS):
        n_docs = rng.randint(3, 40)
        rows = []
        for i in range(n_docs):
            kind = rng.random()
            if kind < 0.08:
                text = ""  # empty: dl=0 still counts toward avgdl
            elif kind < 0.14:
                text = "...!!! ???"  # tokenizes to nothing
            else:
                text = " ".join(
                    rng.choice(VOCAB) for _ in range(rng.randint(1, 30))
                )
            rows.append((i + 1, text))
        query = " ".join(
            rng.choice(VOCAB + ["absentterm"]) for _ in range(rng.randint(1, 5))
        )
        k1 = rng.choice([0.8, 1.2, 2.0])
        b = rng.choice([0.0, 0.5, 0.75, 1.0])

        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: round(r.score, 6)
            for r in bm25_scores(docs, query, k1=k1, b=b).collect()
        }
        pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        con.register("corpus", pdf)
        want = {
            int(r[0]): float(r[1])
            for r in con.execute(_oracle_sql(query_terms(query), k1, b)).fetchall()
        }
        con.unregister("corpus")
        assert set(got) == set(want), (spec, query, k1, b)
        for d in got:
            assert abs(got[d] - want[d]) < 2e-6, (spec, query, d, got[d], want[d])
