"""Invariant tests for the LLM corpus-prep queries (plans/llm.py) —
properties the DuckDB oracle equality can't express: scrub completeness
and idempotence, packing monotonicity, chunk coverage/reconstruction,
probability normalization."""

import math

import pytest
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark import plans
from endtoend_etl_openmeteo_spark.plans.llm import EMAIL_RE, IPV4_RE, PHONE_RE

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return plans.load_all()


def test_pii_scrub_leaves_no_residual_and_is_idempotent(spark, registry):
    scrubbed = registry["q_pii_scrub"].fn(spark, SF)
    residual = scrubbed.select(
        F.sum(
            F.regexp_count("clean", F.lit(EMAIL_RE))
            + F.regexp_count("clean", F.lit(PHONE_RE))
            + F.regexp_count("clean", F.lit(IPV4_RE))
        ).alias("n")
    ).first()["n"]
    assert residual == 0
    # scrubbing already-clean text must be the identity
    rescrub = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("clean"), EMAIL_RE, "[EMAIL]"),
            PHONE_RE,
            "[PHONE]",
        ),
        IPV4_RE,
        "[IP]",
    )
    changed = scrubbed.filter(rescrub != F.col("clean")).count()
    assert changed == 0


def test_pack_sequences_offsets_and_monotonicity(spark, registry):
    rows = registry["q_pack_sequences"].fn(spark, SF).collect()
    assert all(0 <= r.pack_offset < 256 for r in rows)
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r.bin, []).append(r)
    for rs in by_bin.values():
        rs.sort(key=lambda r: r.doc_id)
        assert rs[0].pack_id == 0 and rs[0].pack_offset == 0
        cum = 0
        for r in rs:
            # each doc starts exactly where the previous one ended
            assert r.pack_id == cum // 256 and r.pack_offset == cum % 256
            cum += r.n_tokens


def test_chunk_windows_cover_every_token(spark, registry):
    chunks = registry["q_chunk_windows"].fn(spark, SF)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("chunk_id").alias("max_chunk"),
            F.sum("n_chunk_tokens").alias("covered"),
        )
        .collect()
    )
    toks = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.size(
                F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
            ).alias("n"),
        )
        .collect()
    }
    for r in per_doc:
        n = toks[r.doc_id]
        assert r.n_chunks == math.ceil(n / 6)  # stride-6 start grid
        assert r.max_chunk == r.n_chunks - 1  # dense, zero-based ids
        assert r.covered >= n  # overlap ⇒ every token covered at least once


def test_contamination_is_bounded_and_excludes_benchmark(spark, registry):
    res = registry["q_contamination"].fn(spark, SF)
    bad = res.filter(
        (F.col("n_contaminated") < 0)
        | (F.col("n_contaminated") > F.col("n_shingles"))
        | (F.col("contamination") < 0)
        | (F.col("contamination") > 1)
    ).count()
    assert bad == 0
    bench_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("source") == "src0")
        .select("doc_id")
        .collect()
    }
    assert not bench_ids & {r.doc_id for r in res.select("doc_id").collect()}


def test_rebalance_is_a_distribution(spark, registry):
    rows = registry["q_rebalance"].fn(spark, SF).collect()
    assert abs(sum(r.sample_prob for r in rows) - 1.0) < 1e-4
    assert all(r.sample_prob > 0 and r.upweight > 0 for r in rows)
    # temperature < 1 upweights rare languages over frequent ones
    rarest = min(rows, key=lambda r: r.n_docs)
    commonest = max(rows, key=lambda r: r.n_docs)
    assert rarest.upweight >= commonest.upweight


def test_span_dedup_reassembly_invariants(spark, registry):
    """Clean text = original minus removed spans: token counts reconcile,
    no doc gains text, and every surviving span appears in >= 1 doc only."""
    out = {r.doc_id: r for r in registry["q_span_dedup"].fn(spark, SF).collect()}
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert set(out) == set(docs)
    for doc_id, r in out.items():
        orig_toks = docs[doc_id].split(" ")
        clean_toks = [t for t in r.clean_text.split(" ") if t]
        assert r.n_removed <= r.n_spans
        assert len(clean_toks) <= len(orig_toks)
        if r.n_removed == 0:
            assert clean_toks == orig_toks


def test_lm_score_is_a_proper_score(spark, registry):
    """Perplexity = exp(nll) within rounding, both positive; token counts
    match a direct recount."""
    import math

    rows = registry["q_lm_score"].fn(spark, SF).collect()
    assert rows and all(r.ppl > 0 and r.nll > 0 for r in rows)
    for r in rows:
        assert math.isclose(r.ppl, math.exp(r.nll), rel_tol=1e-4)
    n = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    # split on single space yields no empty tokens in this corpus
    assert all(r.n_tokens == n[r.doc_id] for r in rows)


def test_domain_cap_bounds_every_domain(spark, registry):
    rows = registry["q_domain_cap"].fn(spark, SF).collect()
    per_domain = {}
    for r in rows:
        per_domain.setdefault(r.domain, []).append(r)
        assert "utm_" not in r.canon_url and "ref=" not in r.canon_url
        assert "#" not in r.canon_url
        assert not r.canon_url.startswith("https://www.")
        assert r.canon_url == r.canon_url.lower()
    assert all(len(v) <= 10 for v in per_domain.values())
    # ranks are dense 1..n within each domain
    for v in per_domain.values():
        assert sorted(r.rk for r in v) == list(range(1, len(v) + 1))


def test_resample_preserves_total_mass_and_reweights(spark, registry):
    """Stochastic rounding must preserve expected mass (~n_docs total) and
    actually move mass from the largest language to the smallest."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()
    by_lang = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = registry["q_resample"].fn(spark, SF)
    copies = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = sum(copies.values())
    assert abs(total - n_docs) / n_docs < 0.1
    smallest = min(by_lang, key=by_lang.get)
    largest = max(by_lang, key=by_lang.get)
    assert copies[smallest] / by_lang[smallest] > 1.0  # rare lang upsampled
    assert copies[largest] / by_lang[largest] < 1.0    # dominant lang downsampled
    # copy indices are dense 1..n per doc
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("copy_idx").alias("mx")
    )
    assert per_doc.filter(F.col("n") != F.col("mx")).count() == 0


def test_token_counts_runlengths(spark):
    from pyspark.sql import functions as F

    from endtoend_etl_openmeteo_spark.operators.dedup import token_counts

    df = spark.createDataFrame(
        [(1, ["b", "a", "b", "b"]), (2, ["x"]), (3, [])],
        "id long, toks array<string>",
    )
    got = {
        r["id"]: [(s["w"], s["tf"]) for s in r["wt"]]
        for r in df.select(
            "id", F.array_sort("toks").alias("s")
        ).select("id", token_counts(F.col("s")).alias("wt")).collect()
    }
    assert got[1] == [("a", 1), ("b", 3)]
    assert got[2] == [("x", 1)]
    assert got[3] == []
