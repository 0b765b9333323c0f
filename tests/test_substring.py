"""substring_dup_spans — the exact-substring (Lee et al.) pairwise screen."""

from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.dedup import substring_dup_spans

PASSAGE = "the quick brown fox jumps over the lazy dog near the riverbank"


def _docs(spark):
    rows = [
        # docs 1 and 2 share the 12-token PASSAGE at different offsets;
        # their surrounding text is unrelated -> document-level Jaccard low
        (1, "alpha beta gamma " + PASSAGE + " delta epsilon zeta eta theta"),
        (2, "one two three four five six " + PASSAGE + " seven eight"),
        # doc 3 is unrelated
        (3, "completely different text with no overlap whatsoever in its body "
            "and some more filler words to pass the window length"),
        # docs 4-9 all share a boilerplate footer -> capped out
        *[(i, f"unique body {i} with enough filler tokens here "
               "copyright footer all rights reserved contact us at example "
               "dot com for more information")
          for i in range(4, 10)],
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_passage_detected_with_extents(spark):
    out = {
        (r.id_a, r.id_b): r
        for r in substring_dup_spans(
            _docs(spark), "doc_id", "text", window=12, boilerplate_cap=3
        ).collect()
    }
    assert (1, 2) in out
    r = out[(1, 2)]
    # PASSAGE is 12 tokens -> exactly one shared window per doc
    assert r.n_shared == 1
    assert (r.a_lo, r.a_end) == (4, 15)  # after 3 lead tokens, 1-based
    assert (r.b_lo, r.b_end) == (7, 18)  # after 6 lead tokens
    # the boilerplate footer is shared by 6 docs > cap=3 -> no footer pairs
    assert not any(a >= 4 and b >= 4 for a, b in out)
    # unrelated doc pairs never appear
    assert not any(3 in (a, b) for a, b in out)


def test_boilerplate_cap_admits_small_groups(spark):
    # with the cap raised above the footer's doc frequency the 6 footer
    # docs pair up (15 pairs), proving the cap—not the matcher—was the gate
    out = substring_dup_spans(
        _docs(spark), "doc_id", "text", window=12, boilerplate_cap=10
    ).filter((F.col("id_a") >= 4) & (F.col("id_b") >= 4))
    assert out.count() == 15


def test_short_docs_yield_no_windows(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], "doc_id long, text string"
    )
    # shorter than one window: no pairs, and no sequence(1, n<1) blowup
    assert substring_dup_spans(docs, "doc_id", "text", window=12).count() == 0


def test_strip_duplicate_spans_semantics(spark):
    from endtoend_etl_openmeteo_spark.operators.dedup import (
        strip_duplicate_spans,
        substring_dup_spans,
    )

    docs = _docs(spark).filter("doc_id <= 3")
    pairs = substring_dup_spans(docs, "doc_id", "text", window=12, boilerplate_cap=3)
    out = {r.id: r for r in strip_duplicate_spans(docs, pairs, "doc_id", "text").collect()}
    # all docs come back, untouched ones pass through with zero removed
    assert set(out) == {1, 2, 3}
    assert out[3].n_tokens_removed == 0
    assert out[1].n_tokens_removed == 0  # lower id keeps the canonical copy
    # doc 2 (higher id) loses exactly the 12-token shared passage
    assert out[2].n_tokens_removed == 12
    assert PASSAGE not in out[2].text_clean
    assert out[2].text_clean.startswith("one two three four five six")
    assert out[2].text_clean.endswith("seven eight")
    # token accounting adds up against the normalized originals
    assert out[2].n_tokens_kept == len(out[2].text_clean.split(" "))


def test_strip_per_span_keeps_unique_text_between_copies(spark):
    """Two disjoint copied passages straddling unique text: per-span
    surgery (collect_positions=True) removes BOTH passages and nothing
    else — the unique middle survives (round-7 verdict item; the legacy
    covering-extent mode strips it, pinned below for contrast)."""
    from endtoend_etl_openmeteo_spark.operators.dedup import (
        strip_duplicate_spans,
        substring_dup_spans,
    )

    p1 = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    p2 = "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray"
    unique = "one two three four five"
    docs = spark.createDataFrame(
        [
            (1, p1 + " zulu yankee " + p2),
            (2, p1 + " " + unique + " " + p2),
        ],
        "doc_id long, text string",
    )
    pairs = substring_dup_spans(
        docs, "doc_id", "text", window=12, boilerplate_cap=10,
        collect_positions=True,
    )
    out = {r.id: r for r in strip_duplicate_spans(docs, pairs, "doc_id", "text").collect()}
    assert out[1].n_tokens_removed == 0  # lower id keeps both copies
    assert out[2].text_clean == unique  # exactly the two passages removed
    assert out[2].n_tokens_removed == 24
    assert out[2].n_tokens_kept == 5

    # contrast: legacy covering-extent pairs strip the unique middle too
    legacy = substring_dup_spans(docs, "doc_id", "text", window=12, boilerplate_cap=10)
    out_legacy = {
        r.id: r for r in strip_duplicate_spans(docs, legacy, "doc_id", "text").collect()
    }
    assert out_legacy[2].n_tokens_kept == 0


def test_strip_per_span_within_doc_repeat_occurrences(spark):
    """A shared window repeated at two places in the higher-id doc loses
    BOTH occurrences but keeps the text between them (the per-occurrence
    claim: extents are per window occurrence, not per window hash)."""
    from endtoend_etl_openmeteo_spark.operators.dedup import (
        strip_duplicate_spans,
        substring_dup_spans,
    )

    p = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    mid = "six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, p), (2, p + " " + mid + " " + p)],
        "doc_id long, text string",
    )
    pairs = substring_dup_spans(
        docs, "doc_id", "text", window=12, boilerplate_cap=10,
        collect_positions=True,
    )
    out = {r.id: r for r in strip_duplicate_spans(docs, pairs, "doc_id", "text").collect()}
    assert out[2].text_clean == mid
    assert out[2].n_tokens_removed == 24 and out[2].n_tokens_kept == 5
