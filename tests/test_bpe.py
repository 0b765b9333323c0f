"""Iterative BPE trainer: merge order, overlap semantics, determinism."""

from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.bpe import (
    JOINER,
    bpe_train,
    merge_adjacent,
)

J = JOINER


def test_merge_adjacent_leftmost_nonoverlapping(spark):
    df = spark.createDataFrame(
        [
            (1, ["a", "a", "a"]),        # odd run: leftmost pair fuses, tail stays
            (2, ["a", "a", "a", "a"]),   # even run: two disjoint fusions
            (3, ["x", "a", "a", "x"]),   # interior occurrence
            (4, ["a"]),                  # no pair
            (5, []),                     # empty
        ],
        "id long, toks array<string>",
    )
    got = {
        r.id: r.m
        for r in df.select(
            "id", merge_adjacent(F.col("toks"), "a", "a").alias("m")
        ).collect()
    }
    assert got == {
        1: ["a" + J + "a", "a"],
        2: ["a" + J + "a", "a" + J + "a"],
        3: ["x", "a" + J + "a", "x"],
        4: ["a"],
        5: [],
    }


def test_bpe_train_hand_example(spark):
    # corpus: "b c" x3, "a b" x2 (one doc has both, sharing the 'b')
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "b c")],
        "doc_id long, text string",
    )
    merges, toked = bpe_train(df, n_merges=3, min_count=2)
    # step 0: (b,c) count 3 beats (a,b) count 2
    assert merges[0][1:] == ("b", "c", 3)
    # step 1: after fusing, (a, b<J>c) appears twice
    assert merges[1][1:] == ("a", "b" + J + "c", 2)
    # nothing left with count >= 2 -> early stop
    assert len(merges) == 2
    got = {r.doc_id: r.toks for r in toked.collect()}
    assert got == {1: ["a" + J + "b" + J + "c"], 2: ["a" + J + "b" + J + "c"], 3: ["b" + J + "c"]}


def test_bpe_train_deterministic_on_ties(spark):
    # (a,b) and (c,d) both count 2 -> lexicographic tie-break picks (a,b)
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c d"), (4, "c d")],
        "doc_id long, text string",
    )
    m1, _ = bpe_train(df, n_merges=1)
    m2, _ = bpe_train(df, n_merges=1)
    assert m1 == m2
    assert m1[0][1:] == ("a", "b", 2)


def test_bpe_train_real_corpus_runs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges, toked = bpe_train(docs, n_merges=2)
    assert len(merges) == 2
    assert all(cnt >= 2 for _, _, _, cnt in merges)
    # total token count shrinks by exactly the fused-pair occurrences... at
    # least: strictly monotone decrease is the invariant worth pinning
    base = docs.select(
        F.sum(F.size(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " "))).alias("n")
    ).collect()[0].n
    after = toked.select(F.sum(F.size("toks")).alias("n")).collect()[0].n
    assert after < base


def test_bpe_encode_reproduces_training_tokenization(spark):
    """Applying the trained merge table in order must reproduce the
    trainer's own final corpus tokenization — the portability property
    that lets an offline-trained vocabulary encode new shards."""
    from endtoend_etl_openmeteo_spark.operators.bpe import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat sat"),
            (2, "the cat ran and the cat sat down"),
            (3, "a dog sat on the mat with the cat"),
        ],
        "doc_id long, text string",
    )
    merges, tokenized = bpe_train(docs, n_merges=4, min_count=2)
    assert merges, "expected at least one merge on this corpus"
    want = {r["doc_id"]: r["toks"] for r in tokenized.collect()}
    got = {
        r["doc_id"]: r["toks"] for r in bpe_encode(docs, merges).collect()
    }
    assert got == want
    # and it applies cleanly to UNSEEN text containing a trained pair
    l, r = merges[0][1], merges[0][2]
    unseen = spark.createDataFrame([(9, f"{l} {r} x")], "doc_id long, text string")
    out = bpe_encode(unseen, merges).collect()[0]["toks"]
    assert out[0].count("\x1e") >= 1  # first pair fused
