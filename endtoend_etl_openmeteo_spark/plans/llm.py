"""LLM training-data pipeline queries over `documents`
(training-data-pipeline extension surface, SURVEY.md §7 step 7).

The corpus-preparation stages a pretraining pipeline runs between "raw
crawl" and "tokenized shards": PII redaction, benchmark-contamination
screening, context-window chunking, sequence packing, and outlier
winsorization. All JVM-side built-ins; the synthetic corpus contains no
real PII/URLs, so the scrub query derives its PII-bearing input
deterministically from existing columns — both engines derive the same
input, so the redaction machinery itself is what the oracle checks.

Regex patterns are restricted to the common subset of Java regex (Spark)
and RE2 (DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.curate import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
)
from endtoend_etl_openmeteo_spark.operators.dedup import normalized_text, shingles
from endtoend_etl_openmeteo_spark.plans.registry import register
from endtoend_etl_openmeteo_spark.sources.tables import tbl


@register(
    "q_pii_scrub",
    oracle=f"""
    WITH enriched AS (
      SELECT doc_id,
             concat_ws(' ', text, 'contact',
                       source || '.' || CAST(doc_id AS VARCHAR) || '@example.com',
                       'tel', '+1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                       'from', '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7') AS body
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(body, '{EMAIL_RE}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(body, '{PHONE_RE}')) AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(body, '{IPV4_RE}')) AS BIGINT) AS n_ip,
           regexp_replace(regexp_replace(regexp_replace(body,
             '{EMAIL_RE}', '[EMAIL]', 'g'),
             '{PHONE_RE}', '[PHONE]', 'g'),
             '{IPV4_RE}', '[IP]', 'g') AS clean
    FROM enriched
    """,
    doc="PII redaction pass (corpus-prep staple): regex-redact emails, "
    "phone numbers and IPv4 addresses to typed placeholders and count "
    "each hit class. Pure per-row regexp_replace — narrow, no shuffle, "
    "whole-stage codegen; at 100 TB this is a map-only stage bounded by "
    "scan throughput. The PII-bearing input is derived deterministically "
    "from (text, source, doc_id) because the synthetic corpus carries no "
    "real PII; both engines derive the identical body.",
    tags=("text", "llm"),
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    body = F.concat_ws(
        " ",
        F.col("text"),
        F.lit("contact"),
        F.concat(
            F.col("source"), F.lit("."), F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ),
        F.lit("tel"),
        F.concat(
            F.lit("+1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
        F.lit("from"),
        F.concat(F.lit("10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7")),
    )
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(body, EMAIL_RE, "[EMAIL]"), PHONE_RE, "[PHONE]"
        ),
        IPV4_RE,
        "[IP]",
    )
    return tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_count(body, F.lit(EMAIL_RE)).cast("long").alias("n_email"),
        F.regexp_count(body, F.lit(PHONE_RE)).cast("long").alias("n_phone"),
        F.regexp_count(body, F.lit(IPV4_RE)).cast("long").alias("n_ip"),
        clean.alias("clean"),
    )


@register(
    "q_contamination",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id, source,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, source, array_to_string(toks[i:i+4], ' ') AS sh
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 4, 1))) AS u(i)
    ),
    bench AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0'),
    cand AS (SELECT doc_id, sh FROM sh WHERE source <> 'src0'),
    n AS (SELECT doc_id, count(*) AS n_shingles FROM cand GROUP BY 1),
    o AS (SELECT c.doc_id, count(*) AS n_contaminated
          FROM cand c JOIN bench b USING (sh) GROUP BY 1)
    SELECT n.doc_id, n.n_shingles,
           coalesce(o.n_contaminated, 0) AS n_contaminated,
           round(coalesce(o.n_contaminated, 0) / n.n_shingles, 6) AS contamination
    FROM n LEFT JOIN o ON n.doc_id = o.doc_id
    """,
    doc="Benchmark-contamination screen (eval-integrity staple): treat one "
    "source as the held-out benchmark suite, compute per-candidate-doc "
    "overlap of distinct word 5-gram shingles against the benchmark "
    "shingle set. The benchmark set is broadcast (eval suites are tiny "
    "next to the corpus) so the candidate side streams map-side with no "
    "shuffle of document content; at 100 TB swap the shingle-string join "
    "key for xxhash64(shingle) to shuffle 8-byte keys.",
    tags=("text", "llm", "dedup"),
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.dedup import cpu_parallelize

    docs = tbl(spark, sf_dir, "documents")
    bench = (
        docs.filter(F.col("source") == "src0")
        .select(F.explode(shingles("text", 5)).alias("sh"))
        .distinct()
    )
    # Shingling is CPU-bound per row — spread the single-file scan across
    # cores before the explode (near-no-op on multi-file inputs).
    cand = cpu_parallelize(docs.filter(F.col("source") != "src0")).select(
        "doc_id", F.explode(shingles("text", 5)).alias("sh")
    )
    # One pass: broadcast-left-join a hit flag, then a single aggregate —
    # no second candidate scan, no counts-vs-overlap rejoin.
    flagged = cand.join(
        F.broadcast(bench.withColumn("hit", F.lit(1))), "sh", "left"
    )
    hits = F.count("hit")
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        hits.alias("n_contaminated"),
        F.round(hits / F.count("*"), 6).alias("contamination"),
    )


@register(
    "q_chunk_windows",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST((i - 1) / 6 AS BIGINT) AS chunk_id,
           array_to_string(toks[i:i+7], ' ') AS chunk,
           CAST(len(toks[i:i+7]) AS BIGINT) AS n_chunk_tokens
    FROM norm, unnest(generate_series(1, len(toks), 6)) AS u(i)
    """,
    doc="Context-window chunking (RAG / long-doc pretraining prep): slide "
    "a window-8 stride-6 token frame over each document, emitting "
    "overlapping chunks with stable chunk ids. sequence+transform+explode "
    "— per-row array work inside codegen, no shuffle at any scale; chunk "
    "count grows the row count ~n_tokens/stride-fold, which parquet "
    "scan parallelism absorbs.",
    tags=("text", "llm"),
)
def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = F.split(normalized_text("text"), " ")
    base = tbl(spark, sf_dir, "documents").select("doc_id", toks.alias("toks"))
    starts = F.sequence(F.lit(1), F.size("toks"), F.lit(6))
    chunk = F.array_join(F.slice(F.col("toks"), F.col("i"), 8), " ")
    return (
        base.select("doc_id", "toks", F.explode(starts).alias("i"))
        .select(
            "doc_id",
            ((F.col("i") - 1) / 6).cast("long").alias("chunk_id"),
            chunk.alias("chunk"),
            F.size(F.slice(F.col("toks"), F.col("i"), 8)).cast("long").alias(
                "n_chunk_tokens"
            ),
        )
    )


@register(
    "q_pack_sequences",
    oracle=r"""
    WITH sized AS (
      SELECT doc_id, doc_id % 8 AS bin,
             CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
                  AS BIGINT) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, bin, n_tokens,
             sum(n_tokens) OVER (PARTITION BY bin ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM sized
    )
    SELECT doc_id, bin, n_tokens,
           CAST(floor((cum - n_tokens) / 256.0) AS BIGINT) AS pack_id,
           (cum - n_tokens) % 256 AS pack_offset
    FROM packed
    """,
    doc="Sequence packing (pretraining shard prep, concat-and-split "
    "style): shard docs into bins by id, concatenate within each bin in "
    "deterministic doc_id order, and assign every document the 256-token "
    "context slot its first token lands in. One window cumsum per bin — "
    "a single shuffle on the bin key; bins bound partition size so the "
    "running sum never needs a global order. Greedy best-fit packing "
    "trades determinism for ~2% fewer pad tokens; this form is the one "
    "that parallelizes.",
    tags=("text", "llm", "window"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_tokens = F.size(F.split(normalized_text("text"), " ")).cast("long")
    sized = tbl(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 8).alias("bin"), n_tokens.alias("n_tokens")
    )
    w = (
        Window.partitionBy("bin")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return sized.select(
        "doc_id",
        "bin",
        "n_tokens",
        F.floor(start / 256).cast("long").alias("pack_id"),
        (start % 256).alias("pack_offset"),
    )


@register(
    "q_winsorize",
    oracle="""
    WITH s AS (
      SELECT lang,
             quantile_cont(n_chars, 0.05) AS p05,
             quantile_cont(n_chars, 0.95) AS p95
      FROM documents GROUP BY 1
    )
    SELECT d.doc_id, d.lang, d.n_chars,
           round(least(greatest(d.n_chars, s.p05), s.p95), 6) AS n_chars_winsor
    FROM documents d JOIN s USING (lang)
    """,
    doc="Per-language winsorization of document length (outlier clipping "
    "before quality-score normalization): exact interpolated p05/p95 per "
    "lang (tiny aggregate, broadcast back), clip in a narrow projection. "
    "The per-group stats table is |langs| rows at any corpus size, so "
    "the join is always broadcast; the 100 TB variant swaps "
    "percentile() for percentile_approx() to keep the stats pass "
    "single-shuffle mergeable.",
    tags=("text", "llm", "aggregate"),
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(
        F.percentile("n_chars", 0.05).alias("p05"),
        F.percentile("n_chars", 0.95).alias("p95"),
    )
    return docs.join(F.broadcast(stats), "lang").select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(
            F.least(F.greatest(F.col("n_chars"), F.col("p05")), F.col("p95")), 6
        ).alias("n_chars_winsor"),
    )


@register(
    "q_rebalance",
    oracle="""
    WITH n AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
    w AS (
      SELECT lang, n_docs,
             pow(n_docs / (SELECT sum(n_docs) FROM n), 0.3) AS raw_w
      FROM n
    )
    SELECT lang, n_docs,
           round(raw_w / (SELECT sum(raw_w) FROM w), 6) AS sample_prob,
           round((raw_w / (SELECT sum(raw_w) FROM w))
                 / (n_docs / (SELECT sum(n_docs) FROM n)), 6) AS upweight
    FROM w
    """,
    doc="Temperature-scaled language rebalancing (multilingual pretraining "
    "staple, alpha=0.3): per-language corpus shares raised to alpha and "
    "renormalized into sampling probabilities, plus the per-doc upweight "
    "factor vs natural frequency. One |langs|-row aggregate and two "
    "scalar subqueries — the whole computation is dimension-sized at any "
    "corpus scale.",
    tags=("text", "llm", "aggregate"),
)
def q_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lang_weights(tbl(spark, sf_dir, "documents")).select(
        "lang",
        "n_docs",
        "sample_prob",
        "upweight",
    )


def _lang_weights(docs: DataFrame) -> DataFrame:
    """Per-language temperature weights (alpha=0.3) in ONE corpus scan.

    The totals (corpus size, normalizer z) are computed as empty-
    partitionBy windows over the |langs|-row aggregate — a single-
    partition window is only a bottleneck on data-scale frames; on a
    dimension-sized frame it replaces the scalar-subquery crossJoin
    chain, whose re-derived lineage would re-SCAN the corpus once per
    total (measured: 8 parquet scans in the crossJoin form, 2 after)."""
    wall = Window.partitionBy()
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    w = (
        counts.withColumn("total", F.sum("n_docs").over(wall))
        .withColumn("raw_w", F.pow(F.col("n_docs") / F.col("total"), F.lit(0.3)))
        .withColumn("z", F.sum("raw_w").over(wall))
    )
    prob = F.col("raw_w") / F.col("z")
    return w.select(
        "lang",
        "n_docs",
        F.round(prob, 6).alias("sample_prob"),
        F.round(prob / (F.col("n_docs") / F.col("total")), 6).alias("upweight"),
    )


@register(
    "q_bpe_pairs",
    oracle=r"""
    WITH norm AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
      FROM documents
    ),
    pairs AS (
      SELECT toks[i] || ' ' || toks[i + 1] AS pair
      FROM norm, unnest(generate_series(1, len(toks) - 1)) AS u(i)
    )
    SELECT pair, n FROM (
      SELECT pair, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, pair) AS rnk
      FROM pairs GROUP BY pair
    ) WHERE rnk <= 50
    """,
    doc="BPE merge-candidate counting (tokenizer-training prep): adjacent "
    "token-pair frequencies — the statistic the first BPE merge iteration "
    "maximizes — via a zipped-slice pair explode and one count aggregate; "
    "top-50 by TakeOrdered, no global sort. Map-side partial aggregation "
    "absorbs the ~n_tokens-fold explode before the only shuffle.",
    tags=("text", "llm", "aggregate"),
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.dedup import cpu_parallelize

    toks = F.split(normalized_text("text"), " ")
    pair_arr = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        cpu_parallelize(tbl(spark, sf_dir, "documents").select("text"))
        .select(F.explode(pair_arr).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(50)
        .select("pair", "n")
    )


@register(
    "q_span_dedup",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    spans AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS span_pos,
             array_to_string(t[u.i * 20 + 1 : u.i * 20 + 20], ' ') AS span
      FROM toks,
           unnest(generate_series(0, CAST(ceil(len(t) / 20.0) AS BIGINT) - 1))
             AS u(i)),
    flags AS (
      SELECT doc_id, span_pos, span,
             count(DISTINCT doc_id) OVER (PARTITION BY span) AS n_docs
      FROM spans)
    SELECT doc_id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           coalesce(string_agg(CASE WHEN n_docs = 1 THEN span END, ' '
                               ORDER BY span_pos), '') AS clean_text
    FROM flags GROUP BY doc_id
    """,
    doc="Span-level exact dedup (the line-level dedup of CCNet/RefinedWeb "
    "adapted to delimiter-free text): segment each document into "
    "consecutive 20-token spans, drop every span that occurs verbatim in "
    "more than one document (cross-document boilerplate), and reassemble "
    "the surviving spans in order. Segmentation is a per-row "
    "sequence+transform (no shuffle); the duplicate census is one "
    "count-distinct aggregate keyed by span and a join back — at 100 TB "
    "both shuffles swap the span string for xxhash64(span) so only "
    "8-byte keys move (same swap q_boilerplate_ngrams ships), and "
    "reassembly stays a per-doc sort of a few dozen spans.",
    tags=("text", "llm", "dedup"),
)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.dedup import cpu_parallelize

    t = F.split(F.col("text"), " ")
    n_spans = F.ceil(F.size("t") / F.lit(20.0)).cast("long")
    span_of = lambda i: F.array_join(  # noqa: E731
        F.slice(F.col("t"), i * 20 + 1, 20), " "
    )
    spans = (
        cpu_parallelize(tbl(spark, sf_dir, "documents").select("doc_id", t.alias("t")))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_spans - 1), lambda i: span_of(i)
                )
            ).alias("span_pos", "span"),
        )
        .select("doc_id", F.col("span_pos").cast("long").alias("span_pos"), "span")
    )
    census = spans.groupBy("span").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    flagged = spans.join(census, "span")
    kept = F.when(F.col("n_docs") == 1, F.struct("span_pos", "span"))
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).cast("long").alias(
            "n_removed"
        ),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept)), lambda s: s["span"]),
            " ",
        ).alias("clean_text"),
    )


@register(
    "q_domain_cap",
    oracle=r"""
    WITH urls AS (
      SELECT doc_id, n_chars,
             'https://WWW.' || source || '.Example.COM/p/'
               || CAST(doc_id AS VARCHAR)
               || '/?utm_source=feed&ref=rss&id=' || CAST(doc_id % 7 AS VARCHAR)
               || '#frag' AS url
      FROM documents),
    canon AS (
      SELECT doc_id, n_chars,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               lower(url),
               '#.*$', '', 'g'),
               '([?&])(utm_[a-z]+|ref)=[^&#]*', '\1', 'g'),
               '([?&])&+', '\1', 'g'),
               '[?&]+$', '', 'g'),
               '://www\.', '://', 'g') AS canon_url,
             regexp_replace(regexp_extract(lower(url), '^https?://([^/]+)', 1),
               '^www\.', '') AS domain
      FROM urls)
    SELECT doc_id, domain, canon_url, n_chars, rk FROM (
      SELECT *, CAST(row_number() OVER (
               PARTITION BY domain ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
      FROM canon) WHERE rk <= 10
    """,
    doc="URL canonicalization + per-domain cap (crawl-corpus staple: "
    "tracking-parameter stripping, then bound any one domain's share of "
    "the corpus). The URL is derived deterministically from "
    "(source, doc_id) — the synthetic corpus carries none — so both "
    "engines canonicalize identical inputs; the machinery (lowercase, "
    "fragment strip, utm/ref query-param removal, registered-domain "
    "extraction) is what the oracle checks. Canonicalization is narrow "
    "codegen regex; the cap is one row_number window per domain — "
    "domains are many and individually small, the shape that "
    "parallelizes, with AQE skew splitting covering the one megadomain.",
    tags=("text", "llm", "window"),
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    url = F.concat(
        F.lit("https://WWW."),
        F.col("source"),
        F.lit(".Example.COM/p/"),
        F.col("doc_id").cast("string"),
        F.lit("/?utm_source=feed&ref=rss&id="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("#frag"),
    )
    low = F.lower(url)
    # The param-strip pattern is LEFT-ANCHORED on [?&] (kept via $1): an
    # unanchored '(utm_[a-z]+|ref)=' would eat the tail of longer param
    # names ('href=', 'subref='). Stripping leaves consecutive delimiters
    # ('?&&id=3'), which the ([?&])&+ pass collapses.
    canon_url = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(low, r"#.*$", ""),
                    r"([?&])(utm_[a-z]+|ref)=[^&#]*",
                    "$1",
                ),
                r"([?&])&+",
                "$1",
            ),
            r"[?&]+$",
            "",
        ),
        r"://www\.",
        "://",
    )
    domain = F.regexp_replace(
        F.regexp_extract(low, r"^https?://([^/]+)", 1), r"^www\.", ""
    )
    w = Window.partitionBy("domain").orderBy(F.desc("n_chars"), "doc_id")
    return (
        tbl(spark, sf_dir, "documents")
        .select(
            "doc_id",
            domain.alias("domain"),
            canon_url.alias("canon_url"),
            "n_chars",
        )
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 10)
    )


@register(
    "q_lm_score",
    oracle="""
    WITH words AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> ''),
    wc AS (SELECT w, count(*) AS c FROM words GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS t, count(*) AS v FROM wc)
    SELECT doc_id,
           count(*) AS n_tokens,
           round(avg(-ln((c + 1.0) / (t + v))), 6) AS nll,
           round(exp(avg(-ln((c + 1.0) / (t + v)))), 6) AS ppl
    FROM words JOIN wc USING (w), tot
    GROUP BY doc_id
    """,
    doc="Unigram-LM perplexity score (the KenLM-style quality filter of "
    "CCNet/Gopher reduced to its in-engine form): train add-one-smoothed "
    "unigram counts over the corpus, score each document by mean token "
    "surprisal and perplexity. Two aggregates and one broadcast join — "
    "the LM table is vocabulary-sized, so at 100 TB it is trained once "
    "(min-count-pruned to stay broadcastable; smoothing absorbs the "
    "pruned tail) and reused across scoring runs; scoring itself is a "
    "map-side join plus one per-doc aggregate.",
    tags=("text", "llm", "quality"),
)
def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.dedup import (
        cpu_parallelize,
        token_counts,
    )

    toks = F.filter(F.split("text", " "), lambda w: w != "")
    # One row per DISTINCT word per doc with its map-side tf — both the LM
    # count aggregate and the scoring join shuffle |vocab ∩ doc| rows, not
    # |doc| token occurrences.
    wt = (
        cpu_parallelize(tbl(spark, sf_dir, "documents").select("doc_id", "text"))
        .select("doc_id", F.array_sort(toks).alias("s"))
        .select("doc_id", F.explode(token_counts(F.col("s"))).alias("wt"))
        .select("doc_id", F.col("wt.w").alias("w"), F.col("wt.tf").alias("tf"))
    )
    wc = wt.groupBy("w").agg(F.sum("tf").alias("c"))
    tot = wc.agg(
        F.sum("c").cast("long").alias("t"), F.count("*").alias("v")
    )
    nll_term = -F.log((F.col("c") + 1.0) / (F.col("t") + F.col("v")))
    mean_nll = F.sum(F.col("tf") * nll_term) / F.sum("tf")
    return (
        wt.join(F.broadcast(wc), "w")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(mean_nll, 6).alias("nll"),
            F.round(F.exp(mean_nll), 6).alias("ppl"),
        )
    )


@register(
    "q_shard_pack",
    oracle=r"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             md5(CAST(doc_id AS VARCHAR)) AS s,
             CAST((16 * (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
                   + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
                  % 16 AS INTEGER) AS bucket
      FROM documents),
    off AS (
      SELECT bucket, count(*) AS c FROM keyed GROUP BY bucket),
    off2 AS (
      SELECT bucket,
             CAST(sum(c) OVER (ORDER BY bucket) - c AS BIGINT) AS off
      FROM off),
    idx AS (
      SELECT k.doc_id, k.n_chars,
             o.off + row_number() OVER (
               PARTITION BY k.bucket ORDER BY k.s, k.doc_id) - 1 AS gidx
      FROM keyed k JOIN off2 o USING (bucket))
    SELECT CAST(gidx // 100 AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(min(gidx) AS BIGINT) AS first_idx,
           CAST(max(gidx) AS BIGINT) AS last_idx
    FROM idx GROUP BY shard
    """,
    doc="Fixed-size training-shard packing (the shard-writer tail of a "
    "data pipeline): deterministic pseudorandom permutation -> dense "
    "global index -> shard = gidx div 100, summarized per shard. The "
    "index is the distributed zipWithIndex (operators/layout."
    "global_shuffle_index): per-bucket row_numbers plus driver-side "
    "cumulative offsets (n_buckets rows), so NO single-partition window "
    "exists anywhere — the naive row_number() OVER (ORDER BY key) would "
    "funnel 100 TB through one task. Every shard except the last gets "
    "exactly 100 docs, reproducibly, on any engine.",
    tags=("llm", "layout", "window"),
)
def q_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.layout import shard_assign

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "n_chars")
    shards = shard_assign(docs, "doc_id", shard_size=100, n_buckets=16)
    return shards.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
        F.min("gidx").alias("first_idx"),
        F.max("gidx").alias("last_idx"),
    )


# Training-oracle variant of the encode-oracle iteration (see
# _BPE_SQL_ITER below): identical pair-count/fuse cycle, but keeps the
# winning pair's count so the merge TABLE itself is hash-checkable. The
# corpus here is ALL documents (bpe_train's input), not the encode
# sample, and 4 iterations match n_merges=4.
_BPE_TRAIN_ITER = """
p{i} AS (
  SELECT l, r, n FROM (
    SELECT p[1] AS l, p[2] AS r, count(*) AS n
    FROM full{j}, unnest(list_zip(toks[:len(toks)-1], toks[2:])) AS t(p)
    GROUP BY 1, 2
  ) WHERE n >= 2
  ORDER BY n DESC, l, r LIMIT 1
),
r{i} AS (
  SELECT COALESCE((SELECT chr(31)||l||chr(31)||chr(31)||r||chr(31) FROM p{i}),
                  chr(0)) AS pat,
         COALESCE((SELECT chr(31)||l||chr(30)||r||chr(31) FROM p{i}),
                  chr(0)) AS rep
),
full{i} AS (
  SELECT w, string_split(substr(w, 2, length(w)-2), chr(31)||chr(31)) AS toks
  FROM (SELECT replace(full{j}.w, r{i}.pat, r{i}.rep) AS w FROM full{j}, r{i})
)"""

_BPE_TRAIN_ORACLE = (
    """
WITH full0 AS (
  SELECT chr(31) || replace(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ', chr(31)||chr(31)) || chr(31) AS w,
         string_split(
           replace(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                   ' ', chr(31)||chr(31)),
           chr(31)||chr(31)) AS toks
  FROM documents
),"""
    + _BPE_TRAIN_ITER.format(i=1, j=0)
    + ","
    + _BPE_TRAIN_ITER.format(i=2, j=1)
    + ","
    + _BPE_TRAIN_ITER.format(i=3, j=2)
    + ","
    + _BPE_TRAIN_ITER.format(i=4, j=3)
    + """
SELECT 0::INT AS step, l AS "left", r AS "right", n::BIGINT AS pair_count FROM p1
UNION ALL
SELECT 1::INT, l, r, n::BIGINT FROM p2
UNION ALL
SELECT 2::INT, l, r, n::BIGINT FROM p3
UNION ALL
SELECT 3::INT, l, r, n::BIGINT FROM p4
"""
)


@register(
    "q_bpe_train",
    oracle=_BPE_TRAIN_ORACLE,
    doc="Iterative BPE merge training (operators/bpe.bpe_train): per "
    "iteration one map-side-combined pair-count aggregate hands its top-1 "
    "row to the driver, then a map-only higher-order-aggregate fold fuses "
    "every leftmost-nonoverlapping occurrence corpus-wide — the "
    "genuinely sequential within-row step expressed as a codegen fold, "
    "no UDF. Returns the ordered merge table (the artifact a tokenizer "
    "ships); correctness pinned by hand-example and invariant tests in "
    "tests/test_bpe.py. The kmeans scale shape: iterations multiply "
    "jobs, not state; driver state is n_merges rows.",
    tags=("text", "llm", "iterative"),
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.bpe import bpe_train
    from endtoend_etl_openmeteo_spark.session import release_checkpoint

    merges, toked = bpe_train(
        tbl(spark, sf_dir, "documents").select("doc_id", "text"), n_merges=4
    )
    # only the rule table is kept — release the tokenized-corpus
    # checkpoint (bpe_train's caller-owns-release contract)
    release_checkpoint(toked)
    return spark.createDataFrame(
        merges, "step int, left string, right string, pair_count long"
    )


@register(
    "q_resample",
    oracle="""
    WITH n AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
    tot AS (SELECT sum(n_docs) AS total FROM n),
    w AS (
      SELECT lang, n_docs,
             pow(n_docs / (SELECT total FROM tot), 0.3) AS raw_w
      FROM n),
    z AS (SELECT sum(raw_w) AS z FROM w),
    up AS (
      SELECT lang,
             round((raw_w / (SELECT z FROM z))
                   / (n_docs / (SELECT total FROM tot)), 6) AS upweight
      FROM w),
    docs AS (
      SELECT d.doc_id, d.lang, u.upweight,
             ((d.doc_id % 2147483648) * 2654435761) % 4294967296
               / 4294967296.0 AS unif
      FROM documents d JOIN up u USING (lang)),
    copies AS (
      SELECT doc_id, lang,
             CAST(floor(upweight)
                  + (CASE WHEN unif < upweight - floor(upweight)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
      FROM docs)
    SELECT doc_id, lang, CAST(u.i AS BIGINT) AS copy_idx
    FROM copies, unnest(generate_series(1, n_copies)) AS u(i)
    """,
    doc="Materialize the q_rebalance temperature weights into an actual "
    "resampled corpus: per-doc copies = floor(upweight) plus a "
    "deterministic stochastic-rounding bit (Knuth multiplicative hash of "
    "doc_id as the uniform — reproducible on any engine, no RNG state), "
    "emitted as one row per copy via sequence+explode. Upweights are "
    "dimension-sized and broadcast; the explode is map-only, so the "
    "whole resample is scan-bounded at 100 TB. Downsampled languages "
    "(upweight<1) drop docs where the uniform exceeds the fractional "
    "part — same rule, no separate path.",
    tags=("text", "llm", "sampling"),
)
def q_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = tbl(spark, sf_dir, "documents").select("doc_id", "lang")
    up = _lang_weights(docs).select("lang", "upweight")
    # Knuth multiplicative hash -> uniform in [0,1): pure 64-bit integer
    # arithmetic. Pre-mod doc_id to 2^31 so the product stays < 2^63 for
    # ANY id magnitude — without it, ids past ~3.5e9 (routine at 100 TB)
    # silently wrap negative in Spark and overflow-error in DuckDB.
    unif = (
        ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761))
        % F.lit(4294967296)
    ) / F.lit(4294967296.0)
    frac = F.col("upweight") - F.floor("upweight")
    n_copies = (
        F.floor("upweight") + F.when(unif < frac, 1).otherwise(0)
    ).cast("long")
    copies = F.when(
        F.col("n_copies") >= 1,
        F.sequence(F.lit(1).cast("long"), F.col("n_copies")),
    ).otherwise(F.array().cast("array<bigint>"))
    return (
        docs.join(F.broadcast(up), "lang")
        .withColumn("n_copies", n_copies)
        .select("doc_id", "lang", F.explode(copies).alias("copy_idx"))
    )


# DuckDB replication of one BPE training iteration over the sample: count
# adjacent token pairs, take the top (count desc, then lexicographic — the
# trainer's tie-break), fuse every leftmost-nonoverlapping occurrence. The
# token stream rides a delimited-string form (each token wrapped in
# chr(31)) where plain replace() IS the leftmost-nonoverlapping fold:
# per-token wrapping keeps adjacent matches from consuming each other's
# delimiter. chr(30) is the fused-token joiner (operators/bpe.JOINER);
# chr(0) is the never-matching sentinel when no pair clears min_count=2
# (early-stop parity: the unchanged sample re-derives the same sub-floor
# top pair, so later iterations no-op exactly like the trainer's break).
_BPE_SQL_ITER = """
p{i} AS (
  SELECT l, r FROM (
    SELECT p[1] AS l, p[2] AS r, count(*) AS n
    FROM samp{j}, unnest(list_zip(toks[:len(toks)-1], toks[2:])) AS t(p)
    GROUP BY 1, 2
  ) WHERE n >= 2
  ORDER BY n DESC, l, r LIMIT 1
),
r{i} AS (
  SELECT COALESCE((SELECT chr(31)||l||chr(31)||chr(31)||r||chr(31) FROM p{i}),
                  chr(0)) AS pat,
         COALESCE((SELECT chr(31)||l||chr(30)||r||chr(31) FROM p{i}),
                  chr(0)) AS rep
),
samp{i} AS (
  SELECT w, string_split(substr(w, 2, length(w)-2), chr(31)||chr(31)) AS toks
  FROM (SELECT replace(samp{j}.w, r{i}.pat, r{i}.rep) AS w FROM samp{j}, r{i})
)"""

_BPE_ENCODE_ORACLE = (
    """
WITH wrapped AS (
  SELECT doc_id, text,
         chr(31) || replace(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ' ', chr(31)||chr(31)) || chr(31) AS w
  FROM documents
),
samp0 AS (
  SELECT w, string_split(substr(w, 2, length(w)-2), chr(31)||chr(31)) AS toks
  FROM (SELECT w FROM wrapped ORDER BY doc_id LIMIT 200)
),"""
    + _BPE_SQL_ITER.format(i=1, j=0)
    + ","
    + _BPE_SQL_ITER.format(i=2, j=1)
    + ","
    + _BPE_SQL_ITER.format(i=3, j=2)
    + """,
enc AS (
  SELECT doc_id, text,
         replace(replace(replace(wrapped.w, r1.pat, r1.rep),
                         r2.pat, r2.rep), r3.pat, r3.rep) AS w3
  FROM wrapped, r1, r2, r3
)
SELECT doc_id,
       len(string_split(text, ' '))::BIGINT AS n_raw_tokens,
       len(string_split(substr(w3, 2, length(w3)-2),
                        chr(31)||chr(31)))::BIGINT AS n_bpe_tokens
FROM enc
"""
)


@register(
    "q_bpe_encode",
    oracle=_BPE_ENCODE_ORACLE,
    doc="Tokenizer inference: apply a merge table trained on a bounded "
    "document sample (operators/bpe.bpe_train) to the full corpus as "
    "nested merge_adjacent folds — one map-only projection, no shuffle, "
    "no driver round-trips (operators/bpe.bpe_encode). Emits per-doc "
    "token counts before/after merging. The oracle replicates the FULL "
    "train+encode cycle in DuckDB SQL (wrapped-token string form where "
    "replace() is the leftmost-nonoverlapping fold), so the driver "
    "hash-checks trained-vocabulary application end-to-end; "
    "encode-reproduces-training is additionally pinned by tests/test_bpe.py.",
    tags=("llm", "text"),
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.bpe import bpe_encode, bpe_train

    from endtoend_etl_openmeteo_spark.session import release_checkpoint

    docs = tbl(spark, sf_dir, "documents")
    sample = docs.orderBy("doc_id").limit(200)
    merges, toked = bpe_train(sample, n_merges=3, min_count=2)
    release_checkpoint(toked)  # only the rules are kept (caller-owns-release)
    encoded = bpe_encode(docs, merges)
    return encoded.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_raw_tokens"),
        F.size("toks").cast("long").alias("n_bpe_tokens"),
    )


@register(
    "q_bloom_decontaminate",
    # Same contamination semantics as q_contamination's overlap core, but
    # reporting only contaminated docs — the Bloom pre-filter is invisible
    # to the oracle (no false negatives + exact verify join), visible only
    # to the shuffle row count.
    oracle=r"""
    WITH norm AS (
      SELECT doc_id, source,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, source, array_to_string(toks[i:i+4], ' ') AS sh
      FROM norm, unnest(generate_series(1, greatest(len(toks) - 4, 1))) AS u(i)
    ),
    bench AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0'),
    cand AS (SELECT doc_id, sh FROM sh WHERE source <> 'src0')
    SELECT c.doc_id, count(*)::BIGINT AS n_contaminated
    FROM cand c JOIN bench b USING (sh)
    GROUP BY c.doc_id
    """,
    doc="Bloom-pruned decontamination (operators/bloom.py): the benchmark "
    "shingle set is folded into a ~128 KiB bitmap broadcast as ONE row; "
    "every candidate shingle is probed map-side (xxhash64 family + "
    "bitwise AND in codegen) and only Bloom survivors reach the exact "
    "verification join. No false negatives by construction, so results "
    "are EXACT — at 100 TB the corpus-side shuffle carries the ~p*n "
    "false-positive residue plus true hits instead of every shingle, "
    "while q_contamination's broadcast join still streams all candidate "
    "shingles through the probe. This is the blocklist shape: the same "
    "operator screens URLs or seen-document digests.",
    tags=("llm", "text", "dedup"),
)
def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.bloom import (
        bloom_build,
        bloom_collect,
        bloom_might_contain,
    )
    from endtoend_etl_openmeteo_spark.operators.dedup import cpu_parallelize

    docs = tbl(spark, sf_dir, "documents")
    bench = (
        docs.filter(F.col("source") == "src0")
        .select(F.explode(shingles("text", 5)).alias("sh"))
        .distinct()
        # consumed twice (bloom build + exact verify join) — checkpoint
        # the small reference set once instead of re-shingling src0;
        # LAZY: the bloom-bitmap collect right below is the first action
        # and materializes it (the bpe_train fused-pass pattern)
        .localCheckpoint(eager=False)
    )
    bits = bloom_collect(bloom_build(bench, "sh"))
    cand = cpu_parallelize(docs.filter(F.col("source") != "src0")).select(
        "doc_id", F.explode(shingles("text", 5)).alias("sh")
    )
    survivors = cand.filter(bloom_might_contain("sh", bits))
    return (
        survivors.join(F.broadcast(bench), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )


@register(
    "q_data_mixture",
    # Exponential-race keys replicated verbatim: same Knuth uniform, same
    # -ln(u)/w, same 9dp round-before-rank; DuckDB ranks with one global
    # window (fine for an oracle), Spark with bucketed offsets.
    oracle="""
    WITH w(source, wt) AS (
      VALUES ('src0', 4.0), ('src1', 2.0), ('src2', 1.0), ('src3', 0.5)
    ),
    k AS (
      SELECT d.doc_id, d.source,
             round(-ln((((d.doc_id % 2147483648) * 2654435761) % 4294967296
                        + 1) / 4294967296.0) / w.wt, 9) AS mkey
      FROM documents d JOIN w USING (source)
    )
    SELECT doc_id, source,
           (row_number() OVER (ORDER BY mkey, source, doc_id) - 1)::BIGINT
             AS mix_pos
    FROM k
    """,
    doc="Dataset mixture schedule (operators/layout.weighted_mixture_"
    "index): per-source weights -> ONE deterministic interleaved global "
    "order via Efraimidis-Spirakis exponential-race keys (-ln(u)/w, "
    "Knuth-hash uniform, no RNG state). Unweighted sources are excluded "
    "— mixture is selection + weighting. The global rank is bucketed "
    "per approx-quantile cut points + driver offsets, never a single-"
    "partition window; long-run source proportions track the weights "
    "(pinned by tests/test_layout_sql_http.py).",
    tags=("llm", "sampling", "layout"),
)
def q_data_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.layout import (
        weighted_mixture_index,
    )

    docs = tbl(spark, sf_dir, "documents").select("doc_id", "source")
    out = weighted_mixture_index(
        docs,
        "source",
        "doc_id",
        {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 0.5},
    )
    return out.select("doc_id", "source", "mix_pos")


@register(
    "q_sequence_pack",
    # DuckDB replicates the pack with one global ordered cumsum (fine for
    # an oracle); Spark computes the identical offsets via the bucketed
    # two-phase sum — same spans either way, hash-checked.
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\f\r]'))
                  + 1 AS BIGINT) AS n_eff
      FROM documents),
    c AS (
      SELECT doc_id, n_eff,
             CAST(coalesce(sum(n_eff) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS off
      FROM t)
    SELECT doc_id,
           CAST(u.k AS BIGINT) AS seq_id,
           CAST(greatest(off, u.k * 512) - u.k * 512 AS BIGINT) AS seq_off,
           CAST(greatest(off, u.k * 512) - off AS BIGINT) AS doc_off,
           CAST(least(off + n_eff, (u.k + 1) * 512)
                - greatest(off, u.k * 512) AS BIGINT) AS span_len
    FROM c, unnest(generate_series(off // 512, (off + n_eff - 1) // 512)) AS u(k)
    """,
    doc="Token-level sequence packing (operators/layout.sequence_pack): "
    "concat documents in doc_id order (+1 EOS each, BPE-ish token counts "
    "— the q_token_count regex) and chunk the global token stream every "
    "512 tokens, splitting straddlers — one (doc, seq) span row per "
    "overlap, the GPT-style packer that wastes zero padding. The global "
    "running offset uses quantile-bucketed two-phase summation (driver "
    "holds n_buckets partial sums), never a single-partition "
    "sum-over-order window; span explosion is a narrow generator.",
    tags=("llm", "layout"),
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from endtoend_etl_openmeteo_spark.operators.dedup import cpu_parallelize
    from endtoend_etl_openmeteo_spark.operators.layout import sequence_pack
    from endtoend_etl_openmeteo_spark.plans.text import TOKEN_PATTERN

    # the per-row tokenizer regex is CPU-heavy — a single-file documents
    # scan must not serialize it onto one core (CLAUDE.md rule)
    docs = cpu_parallelize(tbl(spark, sf_dir, "documents")).select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), 0)
        ).cast("long").alias("n_tokens"),
    )
    return sequence_pack(docs, seq_len=512, id_col="doc_id")
