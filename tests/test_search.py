"""Inverted-index build + BM25 retrieval (operators/search.py).

Semantics pinned on a hand-built corpus where the right ranking is
obvious by inspection; the cross-engine hash check lives in
q_inverted_index / q_bm25_search oracles.
"""

import math

from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.search import (
    bm25_topk,
    corpus_stats,
    inverted_index,
)

DOCS = [
    (1, "spark spark spark join"),  # heavy on 'spark'
    (2, "join window batch spark"),  # all four query terms once
    (3, "window window window window window window window window"),  # long, off-topic-ish
    (4, "nothing relevant here at all"),  # no query terms
]
TERMS = ("spark", "join", "window", "batch")


def _corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_inverted_index_postings(spark):
    idx = inverted_index(_corpus(spark))
    rows = {(r["term"], r["doc_id"]): (r["tf"], r["dl"]) for r in idx.collect()}
    assert rows[("spark", 1)] == (3, 4)
    assert rows[("join", 1)] == (1, 4)
    assert rows[("window", 3)] == (8, 8)
    # one row per DISTINCT (term, doc): doc 1 contributes exactly 2 postings
    assert sum(1 for (_, d) in rows if d == 1) == 2
    # dl counts occurrences, not distinct terms
    assert rows[("nothing", 4)][1] == 5


def test_corpus_stats(spark):
    n, avgdl = corpus_stats(_corpus(spark))
    assert n == 4
    assert avgdl == round((4 + 4 + 8 + 5) / 4, 6)


def test_bm25_ranking_and_coverage(spark):
    docs = _corpus(spark)
    n, avgdl = corpus_stats(docs)
    out = bm25_topk(inverted_index(docs), TERMS, n, avgdl, k=10).collect()
    ranked = [r["doc_id"] for r in out]
    # doc 4 has no query term -> absent entirely
    assert 4 not in ranked
    # doc 2 covers all four terms (three of them rare, df=2) and beats the
    # single-term docs; ordering is deterministic
    assert ranked[0] == 2
    assert set(ranked) == {1, 2, 3}
    # scores strictly ordered desc (no unstable ties in this corpus)
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_bm25_matches_reference_formula(spark):
    docs = _corpus(spark)
    n, avgdl = corpus_stats(docs)
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(inverted_index(docs), TERMS, n, avgdl, k=10).collect()
    }
    # pure-Python replication for doc 1: spark tf=3 df=2, join tf=1 df=2
    def idf(df):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def contrib(tf, df, dl):
        return idf(df) * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    expect = round(contrib(3, 2, 4) + contrib(1, 2, 4), 6)
    assert abs(out[1] - expect) <= 1e-6


def test_bm25_absent_terms_are_inert(spark):
    docs = _corpus(spark)
    n, avgdl = corpus_stats(docs)
    idx = inverted_index(docs)
    with_ghost = bm25_topk(idx, TERMS + ("zzzznope",), n, avgdl, k=10).collect()
    plain = bm25_topk(idx, TERMS, n, avgdl, k=10).collect()
    assert [tuple(r) for r in with_ghost] == [tuple(r) for r in plain]


def test_index_filter_prunes_before_scan(spark):
    # the serving path's `term IN (...)` must reach the posting scan as a
    # filter (on a stored term-partitioned index this is partition pruning)
    idx = inverted_index(_corpus(spark)).filter(F.col("term").isin(["spark"]))
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "spark" in plan and "Filter" in plan
