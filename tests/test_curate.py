"""The composed curation pipeline (operators/curate.py): stage semantics
on a hand-built micro-corpus where every gate has a known victim, plus the
MinHash pair_fn override (the 100-TB candidate path)."""

from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.curate import curate_corpus, scrub_pii
from endtoend_etl_openmeteo_spark.operators.dedup import minhash_lsh_pairs

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs far away to the "
    "hills where a river bends through the quiet valley under a pale sky "
    "while birds circle slowly above the old stone bridge near the mill"
)


def _docs(spark):
    rows = [
        # survives everything (canonical of the near-dup pair: smaller id)
        (0, GOOD, "en", "src0"),
        # near-dup of 0 (one word changed) -> clustered, dropped
        (1, GOOD.replace("quick", "rapid"), "en", "src0"),
        # exact dup of 0 modulo case/whitespace -> digest dedup drops it
        (2, GOOD.upper() + "  ", "en", "src1"),
        # junk: pure punctuation -> quality gate drops it
        (3, "!!! ??? ;;; ***", "en", "src1"),
        # disallowed language -> lang gate drops it
        (4, GOOD, "zh", "src2"),
        # unrelated clean doc -> survives
        (5, "completely different content about boats sails harbors and "
            "tides with ropes masts anchors charts lanterns and long calm "
            "nights drifting past distant islands toward morning light "
            "while gulls wheel over the breakwater and fishermen mend nets "
            "on the worn planks of the pier trading stories of storms",
            "en", "src2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_curate_pipeline_stage_semantics(spark):
    out = curate_corpus(_docs(spark), quality_min=0.5).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in out] == [0, 5]
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["lang"] == "en"
    assert by_id[0]["n_pii"] == 0  # raw text carries no PII
    assert by_id[0]["clean"].startswith("the quick brown fox")
    assert 0.0 < by_id[0]["quality"] <= 1.0


def test_curate_minhash_pair_fn_matches_exact(spark):
    docs = _docs(spark)
    exact = curate_corpus(docs)
    lsh = curate_corpus(
        docs,
        pair_fn=lambda d: minhash_lsh_pairs(
            d, "doc_id", "text", n_hashes=32, bands=8, jaccard_threshold=0.2
        ).select("id_a", "id_b"),
    )
    assert sorted(r["doc_id"] for r in exact.collect()) == sorted(
        r["doc_id"] for r in lsh.collect()
    )


def test_curate_pii_enrichment_is_scrubbed(spark):
    enrich = F.concat(F.lit("mail me at "), F.col("source"), F.lit("@example.com"))
    out = curate_corpus(_docs(spark), pii_enrich=enrich).orderBy("doc_id").collect()
    assert all(r["n_pii"] >= 1 for r in out)
    assert all("[EMAIL]" in r["clean"] for r in out)
    assert all("@example.com" not in r["clean"] for r in out)


def test_scrub_pii_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [("reach a@b.io or +1-555-0101 from 10.0.0.7",)], "t string"
    )
    n, clean = scrub_pii("t")
    row = df.select(n.alias("n"), clean.alias("c")).collect()[0]
    assert row["n"] == 3
    assert row["c"] == "reach [EMAIL] or [PHONE] from [IP]"


def test_leakproof_split_never_splits_a_cluster(spark):
    from endtoend_etl_openmeteo_spark.operators.curate import leakproof_split

    # 3 near-identical docs (one cluster), 1 exact pair, many singletons
    rows = [(i, f"unique document number {i} about topic {i*7}") for i in range(20)]
    rows += [
        (100, "the quick brown fox jumps over the lazy dog today"),
        (101, "the quick brown fox jumps over the lazy dog tonight"),
        (102, "the quick brown fox jumps over the lazy dog"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    )
    from endtoend_etl_openmeteo_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", "lang", threshold=0.8)
    out = leakproof_split(docs, pairs).collect()
    by_doc = {r["doc_id"]: (r["group_id"], r["split"]) for r in out}
    # the near-dup trio shares one group and therefore ONE split
    assert by_doc[100][0] == by_doc[101][0] == by_doc[102][0] == 100
    assert len({by_doc[d][1] for d in (100, 101, 102)}) == 1
    # singletons group as themselves
    assert by_doc[5] == (5, by_doc[5][1])
    # the no-leak invariant: every group maps to exactly one split
    groups = {}
    for r in out:
        groups.setdefault(r["group_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in groups.values())
    # determinism: a rerun assigns identically
    again = {r["doc_id"]: (r["group_id"], r["split"])
             for r in leakproof_split(docs, pairs).collect()}
    assert again == by_doc


def test_scrub_pii_counts_match_redactions(spark):
    """Each pattern counts on the text it actually redacts: a replacement
    whose boundary manufactures a later-pattern match ('a@b.co1.2.3.4' —
    the ']' of [EMAIL] creates the \\b the IP regex needs) is both
    redacted AND counted."""
    from endtoend_etl_openmeteo_spark.operators.curate import scrub_pii

    df = spark.createDataFrame([("x a@b.co1.2.3.4 y",)], "text string")
    n, clean = scrub_pii("text")
    r = df.select(n.alias("n"), clean.alias("c")).collect()[0]
    assert r["c"] == "x [EMAIL][IP] y"
    assert r["n"] == 2  # one email + the IP its redaction exposed
