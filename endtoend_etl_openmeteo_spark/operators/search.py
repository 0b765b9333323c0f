"""Inverted index + BM25 ranked retrieval over a document corpus.

The search-serving face of the corpus pipeline: build term-keyed posting
lists ONCE (a map-only pass over documents), then answer keyword queries
by touching only the postings of the query's terms. Reference analog:
none — this is SURVEY §7 training-data extension surface (corpus triage:
"which documents mention X", contamination probes by keyword, boolean
audits over 100 TB without a full scan per question).

Scale shape:
- The index build is shuffle-FREE: term frequencies come out of the
  map-side ``token_counts`` run-length fold, one row per DISTINCT
  (term, doc) — the exchange-free shape TF-IDF uses. A real deployment
  writes the postings parquet partitioned/bucketed BY TERM, so a query's
  ``term IN (...)`` prunes to the handful of term partitions and never
  lists the rest of the index.
- Serving touches |query terms| posting lists, not the corpus: document
  frequency is a term-count over the filtered postings (|terms| rows,
  broadcast back), scoring is arithmetic inside codegen, and the final
  per-document sum aggregates at most |terms| rows per candidate doc.
  Top-k goes through TakeOrdered (sort+limit), never a global window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.dedup import (
    cpu_parallelize,
    normalized_text,
    token_counts,
)


def _tokens(text_col: str):
    return F.filter(F.split(normalized_text(text_col), " "), lambda w: w != "")


def inverted_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Posting lists: (term, doc_id, tf, dl), one row per distinct term
    per document.

    ``tf`` is the within-document term frequency, ``dl`` the document
    length in tokens (the BM25 length-normalization input, denormalized
    onto every posting so serving never re-joins the corpus).
    """
    return (
        cpu_parallelize(docs.select(id_col, text_col))
        .select(
            F.col(id_col).alias("doc_id"), F.array_sort(_tokens(text_col)).alias("s")
        )
        .select(
            "doc_id",
            F.size("s").cast("long").alias("dl"),
            F.explode(token_counts(F.col("s"))).alias("wt"),
        )
        .select(
            F.col("wt.w").alias("term"),
            "doc_id",
            F.col("wt.tf").alias("tf"),
            "dl",
        )
    )


def corpus_stats(docs: DataFrame, text_col: str = "text") -> tuple[int, float]:
    """(n_docs, avgdl) — the two corpus-level BM25 constants.

    One scalar aggregate; ``avgdl`` is rounded to 6 decimals AT THE SOURCE
    (the q_mad_outliers determinism pattern) so downstream score arithmetic
    is identical across engines — unrounded averages can differ by 1 ulp
    between float-sum orders and flip a rounded score at the boundary.
    """
    row = docs.agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.size(_tokens(text_col))), 6).alias("avgdl"),
    ).first()
    return int(row["n"]), float(row["avgdl"])


def bm25_topk(
    postings: DataFrame,
    terms: Sequence[str],
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query by BM25 (Lucene idf form).

    score(d) = sum over query terms t of
      ln(1 + (N - df + 0.5)/(df + 0.5)) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Only the query terms' postings are touched (``term IN`` prunes a
    term-partitioned stored index); df is computed from those postings and
    broadcast back; scores round to 6 decimals before the deterministic
    (score desc, doc_id) top-k so 1-ulp ln() differences can't flip ranks.
    """
    post = postings.filter(F.col("term").isin(list(terms)))
    dfr = post.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        1.0 + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
    )
    return (
        post.join(F.broadcast(dfr), "term")
        .select("doc_id", (idf * norm).alias("contrib"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(k)
    )
