"""End-to-end corpus curation: the composed training-data pipeline.

The individual corpus operators (quality scoring, language ID, exact
dedup, near-dup clustering, PII scrub) each exist as standalone plans;
this module composes them into the DAG a pretraining-data team actually
runs between "raw crawl" and "clean corpus":

    score -> quality gate -> language gate -> exact dedup
          -> near-dup cluster -> keep canonical -> PII scrub

Reference analog: none — this is §7 step 7 extension surface (the
BASELINE.json 100-TB north star); the per-stage semantics mirror the
standalone plans (plans/text.py, plans/llm.py) so the composed output
stays DuckDB-oracle-checkable end to end.

Scale shape, stage by stage:
- scoring + gates: map-only, whole-stage codegen, bounded by scan
  throughput — filters run FIRST so every later stage works on the
  surviving fraction only (the cheap-to-expensive stage ordering every
  curation pipeline wants).
- exact dedup: one exchange keyed on the 32-byte content digest.
- near-dup: pluggable pair generator. The default exact-Jaccard blocked
  join is the oracle-checkable verify stage; at corpus scale pass
  ``pair_fn=minhash_lsh_pairs(...)`` (O(n·bands) candidates). Components
  via pointer-jumping label propagation — O(log diameter) rounds.
- canonical selection: anti-join against the non-canonical cluster
  members; the drop set shuffles 8-byte ids, never documents.
- PII scrub: map-only regex pass on the survivors.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.clusters import dedup_clusters
from endtoend_etl_openmeteo_spark.operators.dedup import (
    ngram_jaccard_pairs,
    normalized_text,
)

#: Shared PII patterns — restricted to the common subset of Java regex
#: (Spark) and RE2 (DuckDB) so plan and oracle compile the same automaton.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (EMAIL_RE, "[EMAIL]"),
    (PHONE_RE, "[PHONE]"),
    (IPV4_RE, "[IP]"),
)


def quality_score(text_col: Column | str, *, saturation_tokens: int = 64) -> Column:
    """Composite quality heuristic (same formula as q_quality_score):
    token-count saturation x (1 - punctuation ratio), rounded to 6dp so
    threshold comparisons are deterministic across engines.

    ASCII-centric by contract: the punctuation class keeps only
    ``[A-Za-z0-9 ]``, so accented letters (ü, é, ß) count as punctuation
    and accent-heavy de/fr/es prose scores lower than equivalent English.
    Fine for the synthetic corpus and the cross-engine oracle (Java regex
    and RE2 agree on this exact class); an accented-corpus deployment
    should widen the class to Unicode letters IN BOTH the operator and
    the q_quality_score oracle together — the two must stay identical."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    n_chars = F.greatest(F.length(text), F.lit(1))
    punct_ratio = F.length(F.regexp_replace(text, "[A-Za-z0-9 ]", "")) / n_chars
    n_tokens = F.size(F.split(text, " "))
    return F.round(
        F.least(n_tokens / F.lit(float(saturation_tokens)), F.lit(1.0))
        * (F.lit(1.0) - punct_ratio),
        6,
    )


def stopword_score(text_col: Column | str, stopwords: tuple[str, ...]) -> Column:
    """Stopword-hit ratio (the q_lang_id language-ID heuristic), 6dp."""
    text = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.lower(text), " ")
    return F.round(
        F.size(F.filter(toks, lambda t: t.isin(*stopwords))) / F.size(toks), 6
    )


def scrub_pii(text_col: Column | str) -> tuple[Column, Column]:
    """(n_pii, clean): total PII hit count and the redacted text.
    Chained regexp_replace — map-only, stays in whole-stage codegen.

    Each pattern is counted on the text it actually REDACTS (the output
    of the previous replacement), not on the original: a replacement can
    manufacture a later-pattern match at its boundary ('a@b.co1.2.3.4' —
    no \\b between 'o' and '1' until '[EMAIL]' lands), and counting on
    the original would redact that IP while reporting one hit fewer —
    n_pii and the redactions in ``clean`` always agree."""
    clean = F.col(text_col) if isinstance(text_col, str) else text_col
    n_pii = F.lit(0).cast("long")
    for pattern, token in PII_PATTERNS:
        n_pii = n_pii + F.regexp_count(clean, F.lit(pattern)).cast("long")
        clean = F.regexp_replace(clean, pattern, token)
    return n_pii, clean


def curate_corpus(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    keep_langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    quality_min: float = 0.5,
    en_stopwords: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is"),
    jaccard_threshold: float = 0.2,
    pair_fn: Callable[[DataFrame], DataFrame] | None = None,
    pii_enrich: Column | None = None,
) -> DataFrame:
    """Run the full curation pipeline; returns one row per SURVIVING doc:
    (id, lang, lang_guess, n_tokens, quality, n_pii, clean).

    ``pair_fn`` overrides near-dup candidate generation (default: exact
    blocked Jaccard on ``lang_col`` — the oracle-checkable verify stage;
    pass a minhash_lsh_pairs closure for the 100-TB candidate path). It
    receives the deduped survivors and must return (id_a, id_b) pairs.

    ``pii_enrich``: optional column appended to the text before the scrub
    stage — the synthetic corpus carries no real PII, so callers that want
    the scrub stage observable inject a deterministic PII-bearing suffix
    (derived from existing columns, identically re-derivable by an
    oracle). Enrichment happens AFTER dedup so it cannot perturb content
    digests or Jaccard sets.

    Evaluation contract: the score/gate/exact-dedup pipeline runs TWICE —
    once eagerly to feed pair generation (dedup_clusters materializes its
    labels), once when the returned plan executes. That is deliberate: the
    intermediate survivor set is corpus-sized, and pinning it in executor
    memory is the wrong default at warehouse scale — recompute is one
    map-side scoring pass plus one digest shuffle. Callers needing one
    pass should persist/checkpoint ``docs`` (or the result) themselves;
    ``docs`` must be deterministic under re-evaluation (no un-materialized
    sample/limit — the weighted_mixture_index caveat).
    """
    # Stage 1-3: score + gates, map-only. Cheap filters first: every
    # downstream exchange carries only the surviving fraction. The
    # scoring pass is regex-heavy per row (two regexp passes + stopword
    # filter + md5 digest), so a single-file corpus must not inherit its
    # one-partition file split — the CLAUDE.md cpu_parallelize rule
    # (a near-no-op at warehouse scale, where inputs span many files).
    from endtoend_etl_openmeteo_spark.operators.dedup import cpu_parallelize

    scored = cpu_parallelize(docs).select(
        "*",
        quality_score(text_col).alias("quality"),
        stopword_score(text_col, en_stopwords).alias("en_score"),
    )
    gated = scored.filter(
        (F.col("quality") >= quality_min) & F.col(lang_col).isin(*keep_langs)
    )

    # Stage 4: exact dedup — keep the smallest id per content digest. The
    # window shuffles survivor rows once, keyed on the 32-byte digest.
    w = Window.partitionBy("fp").orderBy(id_col)
    uniq = (
        gated.withColumn("fp", F.md5(normalized_text(text_col)))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    # Stage 5: near-dup clustering + canonical selection. dedup_clusters
    # labels every clustered doc with its component's min id; dropping
    # rows where id != cluster_id keeps exactly one canonical copy.
    if pair_fn is None:
        pairs = ngram_jaccard_pairs(
            uniq, id_col, text_col, lang_col, threshold=jaccard_threshold
        )
    else:
        pairs = pair_fn(uniq)
    drops = (
        dedup_clusters(pairs)
        .filter(F.col("id") != F.col("cluster_id"))
        .select(F.col("id").alias(id_col))
    )
    kept = uniq.join(drops, id_col, "left_anti")

    # Stage 6: PII scrub on the survivors (map-only tail).
    body = (
        F.concat_ws(" ", F.col(text_col), pii_enrich)
        if pii_enrich is not None
        else F.col(text_col)
    )
    n_pii, clean = scrub_pii(body)
    return kept.select(
        F.col(id_col),
        F.col(lang_col).alias("lang"),
        F.when(F.col("en_score") >= 0.05, "en").otherwise("other").alias("lang_guess"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        "quality",
        n_pii.alias("n_pii"),
        clean.alias("clean"),
    )


def leakproof_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    val_hex_prefixes: tuple[str, ...] = ("0",),
) -> DataFrame:
    """Cluster-aware train/val assignment: every member of a near-dup
    cluster lands in the SAME split.

    Independent per-document bucketing (q_train_split) leaks: a training
    document's near-duplicate in the eval split inflates eval scores —
    the contamination problem *inside* one corpus. The fix is to assign
    by the duplicate CLUSTER: connected components over the near-dup
    pairs (:func:`~.clusters.dedup_clusters`), split keyed on the
    cluster's canonical id (md5 bucket — content-independent,
    RNG-free, stable across runs/engines/partitionings; each TRUE hex
    prefix in ``val_hex_prefixes`` routes 16^-len(prefix) of groups to
    val — ``("0",)`` is 1/16, ``("0a",)`` is 1/256). Singleton documents
    are their own group.

    Returns ``docs`` + (group_id, split). Scale shape: one key-join of
    the corpus against the (id, cluster_id) map — clusters carry ids
    only, never text; the pair generator bounds the quadratic work
    (blocked exact Jaccard for verification, MinHash-LSH at scale).
    """
    from functools import reduce

    prefixes = [str(p).lower() for p in val_hex_prefixes]
    if not prefixes or any(
        not p or any(ch not in "0123456789abcdef" for ch in p)
        for p in prefixes
    ):
        # a non-hex prefix can never match an md5 digest: every group
        # would silently land in 'train' with no error
        raise ValueError(
            f"val_hex_prefixes must be non-empty lowercase-hex strings, "
            f"got {val_hex_prefixes!r}"
        )
    clusters = dedup_clusters(pairs).withColumnRenamed("id", id_col)
    group = F.coalesce(F.col("cluster_id"), F.col(id_col))
    digest = F.md5(group.cast("string"))
    # true prefix match per entry — substring(1, 1).isin(...) silently
    # matched nothing for any multi-character "prefix"
    is_val = reduce(
        lambda a, b: a | b,
        [F.substring(digest, 1, len(p)) == F.lit(p) for p in prefixes],
    )
    split = F.when(is_val, "val").otherwise("train")
    return (
        docs.join(clusters, id_col, "left")
        .withColumn("group_id", group)
        .withColumn("split", split)
        .drop("cluster_id")
    )
