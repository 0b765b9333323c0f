"""Property-based tests (hypothesis) for the ragged-array explode policies
and the merge's last-write-wins invariants — the reference's two
semantics-critical custom pieces (SURVEY §7 hard parts)."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from endtoend_etl_openmeteo_spark.operators.explode import unzip_hourly
from endtoend_etl_openmeteo_spark.operators.merge import dedup_last_write_wins
from endtoend_etl_openmeteo_spark.schemas import WEATHER_HOURLY_SCHEMA
from tests.test_weather_pipeline import _bronze_df, _payload

measures = st.lists(
    st.one_of(st.none(), st.floats(-50, 50, allow_nan=False)), max_size=6
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_hours=st.integers(0, 6),
    temps=measures,
    precips=measures,
    winds=measures,
)
def test_explode_policy_invariants(spark, n_hours, temps, precips, winds):
    times = [f"2025-10-01T{h:02d}:00" for h in range(n_hours)]
    df = _bronze_df(
        spark, [_payload("Warsaw", "2025-10-01", "00", times, temps, precips, winds)]
    )
    at = F.lit("2025-10-01").cast("timestamp")

    padded = unzip_hourly(df, policy="nullpad", ingested_at=at).collect()
    truncated = unzip_hourly(df, policy="truncate", ingested_at=at).collect()

    # nullpad: one row per index of the LONGEST array whose time is non-null
    longest = max(n_hours, len(temps), len(precips), len(winds))
    assert len(padded) == min(n_hours, longest)  # rows need a time value
    # truncate: exactly min-length rows (the fully-paired prefix)
    assert len(truncated) == min(n_hours, len(temps), len(precips), len(winds))
    # truncate's rows are a prefix-subset of nullpad's rows
    pad_by_ts = {r.timestamp: r for r in padded}
    for r in truncated:
        p = pad_by_ts[r.timestamp]
        assert (r.temperature_2m, r.precipitation, r.wind_speed_10m) == (
            p.temperature_2m, p.precipitation, p.wind_speed_10m,
        )
    # within the paired prefix, values survive exactly (index alignment)
    for i, r in enumerate(sorted(truncated, key=lambda r: r.timestamp)):
        assert r.temperature_2m == temps[i]
        assert r.precipitation == precips[i]
        assert r.wind_speed_10m == winds[i]


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    updates=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10), st.floats(-5, 45, allow_nan=False)),
        min_size=1,
        max_size=12,
    )
)
def test_last_write_wins_matches_sequential_upsert(spark, updates):
    """The window dedup must equal a row-at-a-time ON CONFLICT DO UPDATE
    replay (the reference's loader semantics, load_to_postgres.py:96-99)."""
    base_ts = dt.datetime(2025, 10, 1)
    rows = [
        ("Warsaw", base_ts + dt.timedelta(hours=key), temp, 0.0, 1.0,
         base_ts + dt.timedelta(minutes=ing))
        for (key, ing, temp) in updates
    ]
    df = spark.createDataFrame(rows, WEATHER_HOURLY_SCHEMA)
    got = {
        (r.city, r.timestamp): r.temperature_2m
        for r in dedup_last_write_wins(df, ["city", "timestamp"], "_ingested_at").collect()
    }

    # sequential replay in _ingested_at order: later write wins
    expected = {}
    for city, ts, temp, _p, _w, ing in sorted(rows, key=lambda r: r[5]):
        expected[(city, ts)] = temp
    assert set(got) == set(expected)
    for k in expected:
        # ties on _ingested_at: any of the tied values is acceptable
        tied = [r[2] for r in rows
                if (r[0], r[1]) == k and r[5] == max(r2[5] for r2 in rows if (r2[0], r2[1]) == k)]
        assert got[k] in tied


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    values=st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=40)
)
def test_ewma_matches_pandas_truncated_window(spark, values):
    """The windowed higher-order-function EWMA must equal pandas
    ewm(alpha=0.3, adjust=True) restricted to the same 12-lag truncation."""
    import pandas as pd

    df = spark.createDataFrame(
        [(1, dt.datetime(2025, 10, 1) + dt.timedelta(hours=i), i, v)
         for i, v in enumerate(values)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-11, 0)
    num = ("aggregate(transform(arr, (x, i) -> x * pow(0.7D, size(arr) - 1 - i)),"
           " 0D, (a, x) -> a + x)")
    den = ("aggregate(transform(arr, (x, i) -> pow(0.7D, size(arr) - 1 - i)),"
           " 0D, (a, x) -> a + x)")
    got = (
        df.select("event_id", F.collect_list("value").over(w).alias("arr"))
        .select("event_id", (F.expr(num) / F.expr(den)).alias("ewma"))
        .orderBy("event_id")
        .collect()
    )
    # pandas reference: adjust=True EWMA over each 12-element trailing slice
    s = pd.Series(values)
    for r in got:
        lo = max(0, r.event_id - 11)
        window = s.iloc[lo : r.event_id + 1]
        expected = window.ewm(alpha=0.3, adjust=True).mean().iloc[-1]
        assert r.ewma == pytest.approx(expected, rel=1e-9, abs=1e-9)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=25)
)
def test_scd2_intervals_tile_each_users_history(spark, events):
    """SCD2 output must tile the timeline: consecutive runs collapse, each
    valid_to equals the next valid_from, exactly one current row per user,
    and run lengths sum to the event count."""
    from endtoend_etl_openmeteo_spark.plans import load_all

    base = dt.datetime(2025, 10, 1)
    df = spark.createDataFrame(
        [(7, e, base + dt.timedelta(hours=i), i, 0.0, "{}")
         for i, e in enumerate(events)],
        "user_id long, event_type string, ts timestamp, event_id long,"
        " value double, props string",
    )
    df.createOrReplaceTempView("__scd2_prop_events")
    # reuse the registered query's logic by replaying it on this frame
    from pyspark.sql import Window

    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(wo)
    chg = F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    running = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = (
        df.withColumn("__chg", chg)
        .withColumn("__grp", F.sum("__chg").over(running))
        .groupBy("user_id", "event_type", "__grp")
        .agg(F.min("ts").alias("valid_from"), F.count("*").alias("n_events"))
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    out = runs.select(
        "user_id", "event_type", "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
        "n_events",
    ).orderBy("valid_from").collect()

    # expected runs via itertools-style scan
    expected_runs = []
    for i, e in enumerate(events):
        if not expected_runs or expected_runs[-1][0] != e:
            expected_runs.append([e, 0])
        expected_runs[-1][1] += 1
    assert [(r.event_type, r.n_events) for r in out] == [
        (e, n) for e, n in expected_runs
    ]
    assert sum(r.n_events for r in out) == len(events)
    assert [r.is_current for r in out] == [False] * (len(out) - 1) + [True]
    for cur, nxt in zip(out, out[1:]):
        assert cur.valid_to == nxt.valid_from  # gap-free tiling


from endtoend_etl_openmeteo_spark.operators.bpe import JOINER


def _fuse_reference(toks: list[str], left: str, right: str) -> list[str]:
    """Pure-Python leftmost-nonoverlapping fuse — the BPE merge oracle."""
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
            out.append(left + JOINER + right)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    toks=st.lists(st.sampled_from(["a", "b", "c"]), max_size=12),
    left=st.sampled_from(["a", "b"]),
    right=st.sampled_from(["a", "b"]),
)
def test_merge_adjacent_matches_reference_fold(spark, toks, left, right):
    from endtoend_etl_openmeteo_spark.operators.bpe import merge_adjacent

    df = spark.createDataFrame([(toks,)], "toks array<string>")
    got = df.select(merge_adjacent(F.col("toks"), left, right).alias("m")).collect()[
        0
    ].m
    assert got == _fuse_reference(toks, left, right)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),  # type bucket
            st.integers(0, 72 * 3600 - 1),  # second offset inside 3 days
            st.floats(-100, 100, allow_nan=False),
        ),
        min_size=2,
        max_size=40,
        unique_by=lambda e: (e[0], e[1]),
    )
)
def test_twap_bounded_by_group_extremes(spark, events):
    """A time-weighted average is a convex combination of the group's
    observed values (minus each group's last observation, which carries no
    holding time) — it must lie within [min, max] of the contributing
    values."""
    import datetime as dt

    from pyspark.sql import Window

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=sec), f"t{ty}", val)
            for i, (ty, sec, val) in enumerate(events)
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )
    day = F.date_trunc("day", "ts")
    w = Window.partitionBy("event_type", day).orderBy("ts", "event_id")
    um = F.unix_micros(F.col("ts"))
    contributed = (
        df.withColumn("dt_us", (F.lead(um).over(w) - um).cast("double"))
        .filter(F.col("dt_us").isNotNull())
    )
    got = (
        contributed.groupBy("event_type", day.alias("day"))
        .agg(
            (F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us")).alias("twap"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    )
    for r in got:
        assert r.lo - 1e-9 <= r.twap <= r.hi + 1e-9, r


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 48 * 3600 - 1),
            st.floats(-1000, 1000, allow_nan=False),
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda e: e[0],
    )
)
def test_ohlc_internal_consistency(spark, rows):
    """low <= open, close <= high; volume counts every event; open/close
    pick the values at the bucket's earliest/latest (ts, event_id)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, base + dt.timedelta(seconds=sec), val)
            for i, (sec, val) in enumerate(rows)
        ],
        "event_id long, ts timestamp, value double",
    )
    ordkey = F.struct("ts", "event_id")
    got = (
        df.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.min_by("value", ordkey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordkey).alias("close"),
            F.count("*").alias("volume"),
        )
        .collect()
    )
    assert sum(r.volume for r in got) == len(rows)
    for r in got:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vecs=st.lists(
        st.lists(st.floats(-1, 1, allow_nan=False), min_size=8, max_size=8),
        min_size=4,
        max_size=20,
    )
)
def test_pq_codes_valid_and_rerank_exact_on_selected(spark, vecs):
    """PQ codes stay in [0, k) for every block; the re-rank stage's
    cos_sim equals the plain exact cosine for every (query, neighbor) pair
    it returns (re-rank never reports quantized similarities)."""
    from endtoend_etl_openmeteo_spark.operators.similarity import (
        cosine_topk,
        pq_encode,
        pq_topk_rerank,
        pq_train,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    k_sub = 4
    cb = pq_train(df, m=4, k=k_sub, iterations=2)
    codes = pq_encode(df, cb)
    for r in codes.collect():
        assert len(r["codes"]) == 4
        assert all(0 <= c < k_sub for c in r["codes"])
    queries = df.filter(F.col("vec_id") < 2)
    got = pq_topk_rerank(codes, cb, df, queries, k=5, n_candidates=8).collect()
    exact = {
        (r.q_id, r.n_id): r.cos_sim for r in cosine_topk(df, queries, k=100).collect()
    }
    for r in got:
        assert r.cos_sim == exact[(r.q_id, r.n_id)], (r, exact.get((r.q_id, r.n_id)))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(2, 60),
    w_a=st.floats(0.25, 8.0, allow_nan=False),
    w_b=st.floats(0.25, 8.0, allow_nan=False),
)
def test_mixture_is_permutation_for_any_weights(spark, n, w_a, w_b):
    """weighted_mixture_index must emit a dense 0..n-1 permutation of the
    weighted rows for ANY positive weights, with every input row kept
    exactly once — weights shape the ORDER, never membership."""
    from endtoend_etl_openmeteo_spark.operators.layout import (
        weighted_mixture_index,
    )

    docs = spark.range(n).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 3 = 0 THEN 'a' ELSE 'b' END AS source",
    )
    out = weighted_mixture_index(
        docs, "source", "doc_id", {"a": w_a, "b": w_b}
    ).collect()
    assert len(out) == n
    assert sorted(r["mix_pos"] for r in out) == list(range(n))
    assert sorted(r["doc_id"] for r in out) == list(range(n))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(seed=st.integers(0, 10_000))
def test_curate_survivors_pass_every_gate(spark, seed):
    """Pipeline postconditions on randomized corpora: every surviving doc
    passes the quality gate and the language allowlist, carries a UNIQUE
    normalized digest, and no surviving pair within a language block is
    near-duplicate above the threshold (the canonical-selection
    invariant)."""
    import random

    from endtoend_etl_openmeteo_spark.operators.curate import curate_corpus
    from endtoend_etl_openmeteo_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    rng = random.Random(seed)
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    rows = []
    for i in range(24):
        n_words = rng.randint(2, 80)
        text = " ".join(rng.choice(words) for _ in range(n_words))
        lang = rng.choice(["en", "de", "zh"])
        rows.append((i, text, lang, f"s{i % 3}"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = curate_corpus(docs, quality_min=0.5)
    survivors = out.collect()
    assert all(r["quality"] >= 0.5 for r in survivors)
    assert all(r["lang"] in ("en", "de", "fr", "es") for r in survivors)
    kept_ids = {r["doc_id"] for r in survivors}
    kept_docs = docs.filter(F.col("doc_id").isin(*kept_ids)) if kept_ids else None
    if kept_docs is not None:
        from endtoend_etl_openmeteo_spark.operators.dedup import normalized_text

        fps = kept_docs.select(F.md5(normalized_text("text")).alias("fp")).collect()
        assert len({r["fp"] for r in fps}) == len(fps)  # digest-unique
        pairs = ngram_jaccard_pairs(
            kept_docs, "doc_id", "text", "lang", threshold=0.2
        ).collect()
        assert pairs == []  # no near-dup pair survives


def _brute_shared_windows(texts: dict[int, str], window: int):
    """Reference implementation: exact string windows, pure Python."""
    import re

    spans = {}
    for i, t in texts.items():
        toks = re.sub(r"\s+", " ", t.lower().strip()).split(" ")
        spans[i] = {}
        for p in range(len(toks) - window + 1):
            spans[i].setdefault(" ".join(toks[p:p + window]), []).append(p + 1)
    pairs = {}
    for a in sorted(spans):
        for b in sorted(spans):
            if a >= b:
                continue
            shared = set(spans[a]) & set(spans[b])
            if shared:
                pairs[(a, b)] = shared
    return spans, pairs


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_substring_dup_matches_bruteforce(spark, data):
    from endtoend_etl_openmeteo_spark.operators.dedup import substring_dup_spans

    # small vocab + short docs force frequent window collisions
    word = st.sampled_from(["aa", "bb", "cc", "dd"])
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)
    texts = {i: data.draw(doc) for i in range(6)}
    window = 3
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r
        for r in substring_dup_spans(
            df, "doc_id", "text", window=window, boilerplate_cap=100
        ).collect()
    }
    spans, expect = _brute_shared_windows(texts, window)
    assert set(got) == set(expect)
    for (a, b), shared in expect.items():
        r = got[(a, b)]
        assert r.n_shared == len(shared)
        a_pos = [p for s in shared for p in spans[a][s]]
        b_pos = [p for s in shared for p in spans[b][s]]
        assert r.a_lo == min(a_pos) and r.a_end == max(a_pos) + window - 1
        assert r.b_lo == min(b_pos) and r.b_end == max(b_pos) + window - 1


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_strip_spans_per_span_matches_bruteforce(spark, data):
    """Per-span surgery == pure-Python reference: the higher-id doc of
    every pair loses exactly the union of its shared-window occurrence
    extents [p, p+w-1] — never the covering extent, never a position no
    shared occurrence touches."""
    from endtoend_etl_openmeteo_spark.operators.dedup import (
        strip_duplicate_spans,
        substring_dup_spans,
    )

    word = st.sampled_from(["aa", "bb", "cc", "dd"])
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)
    texts = {i: data.draw(doc) for i in range(6)}
    window = 3
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    pairs = substring_dup_spans(
        df, "doc_id", "text", window=window, boilerplate_cap=100,
        collect_positions=True,
    )
    got = {r.id: r for r in strip_duplicate_spans(df, pairs, "doc_id", "text").collect()}
    spans, expect = _brute_shared_windows(texts, window)
    for i, t in texts.items():
        toks = [w for w in t.split(" ") if w]
        covered = set()
        for (a, b), shared in expect.items():
            if b != i:
                continue
            for s in shared:
                for p in spans[b][s]:
                    covered.update(range(p, p + window))  # 1-based [p, p+w-1]
        kept = [tok for j, tok in enumerate(toks, start=1) if j not in covered]
        assert got[i].n_tokens_removed == len(covered), i
        assert got[i].text_clean == " ".join(kept), i


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=st.data())
def test_semdedup_pairs_within_clusters_match_bruteforce(spark, data):
    """semdedup output == brute-force cosine over pairs sharing a kmeans
    cluster: the bucketing must lose exactly the cross-cluster pairs and
    nothing else, with cosines equal to the exact fold."""
    import math

    from endtoend_etl_openmeteo_spark.operators.clusters import kmeans
    from endtoend_etl_openmeteo_spark.operators.similarity import semdedup_pairs

    dim = 4
    vec = st.lists(
        st.floats(-1, 1, allow_nan=False, width=32), min_size=dim, max_size=dim
    )
    rows = [(i, data.draw(vec)) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.id_a, r.id_b): r.cos_sim
        for r in semdedup_pairs(
            df, k=2, iterations=2, iter_dp=6, threshold=-2.0
        ).collect()
    }
    labels, _ = kmeans(df, k=2, iterations=2, iter_dp=6)
    cluster = {r.id: r.cluster for r in labels.collect()}
    vecs = dict(rows)
    for a in range(8):
        for b in range(a + 1, 8):
            if cluster[a] != cluster[b]:
                assert (a, b) not in got
                continue
            dot_ab = sum(x * y for x, y in zip(vecs[a], vecs[b]))
            na = math.sqrt(sum(x * x for x in vecs[a]))
            nb = math.sqrt(sum(x * x for x in vecs[b]))
            if na * nb == 0:
                assert (a, b) not in got  # null cosine filtered
                continue
            assert got[(a, b)] == pytest.approx(dot_ab / (na * nb), abs=1e-5)
