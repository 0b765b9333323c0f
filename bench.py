"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution uses the noop sink so the FULL plan runs (a count() would let
Catalyst prune projections and under-measure narrow queries).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from endtoend_etl_openmeteo_spark import plans  # noqa: E402
from endtoend_etl_openmeteo_spark.session import (  # noqa: E402
    get_spark,
    release_persistent_rdds,
)


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


#: Environment-calibration anchor. Three sentinel queries whose SOURCE has
#: been frozen since round 2 (plans/relational.py q_scan, plans/advanced.py
#: q_tpch_q18, plans/sketches.py q_sketch_rollup), with their sf0.1 times
#: from the round-8 clean reference run (BENCH_LOCAL.json at 3f383e1).
#: `sentinel_ratio` = geometric mean of current/baseline over these three:
#: ~1.0 means the machine matches the reference environment; a uniform
#: inflation (e.g. round 8's 1.4× drift) shows up here instead of reading
#: as a plan regression. Update the baselines ONLY when the sentinels'
#: source changes (and say so in the commit).
SENTINEL_BASELINE_S: dict[str, float] = {
    "q_scan": 0.1835,
    "q_tpch_q18": 1.1209,
    "q_sketch_rollup": 1.2447,
}

#: Baselines for the interleaved 25/50/75/100% segment samples. These
#: samples share one regime: a settled JVM with the sentinel plans
#: GENUINELY warm — as of the round-12 OPTIMIZATION pass the engine's
#: codegen cache holds the whole suite (session.py
#: spark.sql.codegen.cache.maxEntries=2000), so settled samples no
#: longer recompile between segments. That regime change is a one-time
#: series rebase (the same kind as the round-12 warm-series rebase the
#: build round called out): baselines re-frozen as medians of the eight
#: steal-quiet (<0.6%) settled samples across the two back-to-back
#: cache=2000 sf0.1 runs recorded in OPTIMIZATION_r12.md. The 0% sample
#: stays the cold-compile series (sentinel_cold0_ratio) — first
#: compilation is cache-size-independent. Update only when sentinel
#: source or the compile-cache regime changes (and say so).
SENTINEL_WARM_BASELINE_S: dict[str, float] | None = {
    "q_scan": 0.169,
    "q_tpch_q18": 0.944,
    "q_sketch_rollup": 0.959,
}


def sentinel_ratio(timings: dict[str, float]) -> float | None:
    """Geomean of current/baseline over the sentinel queries (None if any
    sentinel failed or is missing)."""
    ratios = []
    for name, base in SENTINEL_BASELINE_S.items():
        t = timings.get(name, -1.0)
        if t <= 0:
            return None
        ratios.append(t / base)
    prod = 1.0
    for r in ratios:
        prod *= r
    return round(prod ** (1.0 / len(ratios)), 3)


def _warm_ratio(timings: dict[str, float]) -> float | None:
    """In-suite sentinel timings vs the WARM baselines (as of round 12 the
    0% sample pre-compiles the sentinel plans, so in-suite runs are warm)."""
    if SENTINEL_WARM_BASELINE_S is None:
        return None
    prod = 1.0
    for name, base in SENTINEL_WARM_BASELINE_S.items():
        t = timings.get(name, -1.0)
        if t <= 0:
            return None
        prod *= t / base
    return round(prod ** (1.0 / len(SENTINEL_WARM_BASELINE_S)), 3)


def _cpu_sample() -> tuple[int, int] | None:
    """(total_jiffies, steal_jiffies) from the aggregate /proc/stat cpu
    line; None off-Linux. Hypervisor steal is the drift source the 3-point
    sentinel could not localize (round-11 verdict #2)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError, IndexError):
        return None


def _steal_pct(before, after) -> float | None:
    if before is None or after is None:
        return None
    dt = after[0] - before[0]
    return round(100.0 * (after[1] - before[1]) / dt, 2) if dt > 0 else None


def sentinel_sample(
    spark, registry, sf_dir: str, at_index: int, baseline: dict[str, float] | None
) -> dict:
    """One untimed sentinel pass (the 3 frozen queries) at a segment
    boundary. Interleaving these through the suite makes minute-scale
    machine drift decidable from the artifact: each query's segment has
    its own calibration ratio instead of one whole-run number. `baseline`
    is the cold dict for the 0% sample (first compilation, matching how
    the frozen baselines were measured) and the warm dict for later
    samples; None (non-sf0.1 runs) records raw times with a null ratio —
    intra-run drift is still decidable sample-to-sample."""
    c0 = _cpu_sample()
    per: dict[str, float] = {}
    for name in SENTINEL_BASELINE_S:
        t0 = time.perf_counter()
        try:
            run_query(registry[name].fn(spark, sf_dir))
            per[name] = round(time.perf_counter() - t0, 4)
        except Exception:
            per[name] = -1.0
    ratio = None
    if baseline is not None and all(per.get(n, -1.0) > 0 for n in baseline):
        prod = 1.0
        for name, base in baseline.items():
            prod *= per[name] / base
        ratio = round(prod ** (1.0 / len(baseline)), 3)
    return {
        "at_index": at_index,
        "t_unix": round(time.time(), 1),
        "per_query": per,
        "ratio": ratio,
        "steal_pct_during": _steal_pct(c0, _cpu_sample()),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    registry = plans.load_all()
    spark = get_spark("bench")
    try:
        # The post-query release_persistent_rdds makes later actions that
        # shared a released checkpoint log one WARN per RDD ("was locally
        # checkpointed ... cannot be recomputed") — expected under the
        # bench's release discipline and pure tail noise in the captured
        # stderr; silence exactly that logger (r12 verdict hygiene item).
        jvm = spark._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.rdd.MapPartitionsRDD",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass  # logging backend drift — noise returns, timings unaffected

    # JVM/codegen warmup on a cheap query so q-order doesn't skew timings.
    run_query(registry["q_scan"].fn(spark, sf_dir))
    # Python-worker warmup: spawn the pandas daemons once so Arrow-batched
    # queries measure steady-state compute, not interpreter startup.
    warm = spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    )
    warm.mapInPandas(lambda it: it, schema="id long").write.format("noop").mode(
        "overwrite"
    ).save()
    # Higher-order-function warmup: the first aggregate/transform/zip_with
    # expression pays Janino class-loading for the lambda-eval paths
    # (~4s), which would land on whichever HOF query sorts first.
    run_query(
        spark.range(1000).selectExpr(
            "aggregate(sequence(1, 20), cast(0 as bigint), (a, x) -> a + x) s",
            "transform(sequence(1, 20), x -> x * 2) t",
            "zip_with(sequence(1, 5), sequence(1, 5), (a, b) -> a + b) z",
        )
    )
    # NOTE a full-registry warmup pass (every query once at sf0.001 before
    # timing) was tried and measured NET HARMFUL: 216.5 s cold vs 258.6 s
    # warm at sf0.1 (and 256.1 s with a 12 g heap, so not GC headroom).
    # At the time Catalyst's generated-class cache held its default 100
    # entries (spark.sql.codegen.cache.maxEntries, static conf) — warming
    # 160+ distinct plans evicted everything, so the timed pass recompiled
    # anyway while paying the warmup's metaspace/JIT churn. Round 12
    # raised the engine cache to 2000 (session.py) so identical plans now
    # stay compiled WITHIN a run; a pre-timing warmup pass would hide
    # each query's honest first-run compile cost, so it stays out. The
    # three targeted warmups above (codegen paths shared by ALL queries)
    # remain the useful subset.

    # Sentinel samples interleave at the 0/25/50/75/100% marks of the
    # sorted run order (untimed — excluded from `value`), so any query can
    # be normalized by ITS segment's calibration ratio rather than one
    # whole-run number. Per-query /proc/stat steal is recorded alongside:
    # together they make raw-vs-adjusted sign flips (round-11 verdict #2)
    # resolvable from the artifact alone.
    ordered = sorted(registry.items())
    n = len(ordered)
    bounds = sorted({0, n // 4, n // 2, (3 * n) // 4, n})
    apply_baseline = abs(sf - 0.1) < 1e-9
    samples: list[dict] = []
    timings: dict[str, float] = {}
    steal: dict[str, float | None] = {}
    for i, (name, spec) in enumerate(ordered):
        if i in bounds:
            base = None
            if apply_baseline:
                base = SENTINEL_BASELINE_S if i == 0 else SENTINEL_WARM_BASELINE_S
            sample = sentinel_sample(spark, registry, sf_dir, i, base)
            samples.append(sample)
            if i == 0:
                # The 0% pass IS the three sentinel queries' cold runs —
                # record them as the timed entries (measured identically:
                # noop sink, perf_counter bracket) instead of re-running
                # them warm in suite order. This removes the r12 warm
                # bias on `value` (the 0% pass pre-compiles their plans,
                # so an in-suite re-run was ~1-1.5 s flattering) and
                # restores the cold in-suite series. Cross-round note:
                # BENCH_r12's entries for these three are warm-regime.
                for s_name, s_t in sample["per_query"].items():
                    if s_t > 0:
                        timings[s_name] = s_t
                        steal[s_name] = sample["steal_pct_during"]
        if name in SENTINEL_BASELINE_S and timings.get(name, -1.0) > 0:
            continue  # timed cold at the 0% sample above
        c0 = _cpu_sample()
        t0 = time.perf_counter()
        try:
            run_query(spec.fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # a failed query must not hide the rest
            timings[name] = -1.0
            print(f"bench error in {name}: {e}", file=sys.stderr)
        finally:
            steal[name] = _steal_pct(c0, _cpu_sample())
            # Each query's plan has been fully executed (noop sink) —
            # release any localCheckpoint blocks it pinned so later
            # queries measure the query, not accumulated session state.
            release_persistent_rdds(spark)
    samples.append(
        sentinel_sample(
            spark, registry, sf_dir, n, SENTINEL_WARM_BASELINE_S if apply_baseline else None
        )
    )

    total = round(sum(t for t in timings.values() if t >= 0), 4)
    # Full per-query map → local artifact (committed per round). The driver
    # captures only the ~2 KB TAIL of stdout, so the printed line must stay
    # compact: round-6's full 164-query line was front-truncated and parsed
    # as null, losing half the suite's timings. The driver line carries the
    # 50 driver-prefix queries at 2 dp (~1.2 KB) + suite totals; everything
    # else is recoverable from BENCH_LOCAL.json.
    # The baseline times are sf0.1-specific — at any other SF the ratio
    # would read as machine drift when it's really data-scale, so emit
    # null there.
    # Headline ratio = MEDIAN of the settled (25/50/75/100%) samples —
    # the most stable calibration statistic the run produces. The 0%
    # sample (fresh-JVM startup burst; reliably steal-inflated) and the
    # in-suite sentinel timings (warm as of round 12 — sample 0 compiles
    # their plans, so the pre-r12 cold series ended there) are both kept
    # in the artifact for transparency.
    settled = [s["ratio"] for s in samples[1:] if s["ratio"] is not None]
    settled.sort()
    ratio = settled[len(settled) // 2] if (apply_baseline and settled) else None
    full = {
        "metric": "declared_query_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "sentinel_ratio": ratio,
        "sentinel_cold0_ratio": samples[0]["ratio"] if apply_baseline else None,
        # timings now carry the COLD sentinel runs (sample 0), so the
        # warm in-suite ratio is computed from the final settled sample
        "sentinel_ratio_insuite_warm": (
            _warm_ratio(samples[-1]["per_query"]) if apply_baseline else None
        ),
        "sentinel_baseline_s": SENTINEL_BASELINE_S,
        "sentinel_warm_baseline_s": SENTINEL_WARM_BASELINE_S,
        # `queries` preserves run order (sorted names); a query at run
        # index i belongs to the segment whose bounding samples bracket i.
        "sentinel_segments": samples,
        "steal_pct": steal,
    }
    (REPO / "BENCH_LOCAL.json").write_text(json.dumps(full, indent=1) + "\n")
    prefix = [n for n in plans.PRIORITY if n in timings][:50]
    compact_q = {n: round(timings[n], 2) for n in prefix}
    n_err = sum(1 for t in timings.values() if t < 0)
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": compact_q,
                "sf": sf,
                "n_queries": len(timings),
                "n_errors": n_err,
                "sentinel_ratio": ratio,
                "sentinel_segments": [s["ratio"] for s in samples],
                # contention made machine-filterable from the driver line
                # (r12 verdict item 6b): per-segment steal during the
                # sentinel samples + the driver-prefix queries that ran
                # under >= 2% steal (sparse — empty on a quiet box)
                "segment_steal": [s["steal_pct_during"] for s in samples],
                "steal_hot": {
                    n2: s2
                    for n2, s2 in ((m, steal.get(m)) for m in prefix)
                    if s2 is not None and s2 >= 2.0
                },
                "tail_sec": round(
                    sum(t for n, t in timings.items() if t >= 0 and n not in compact_q), 2
                ),
                "full_map": "BENCH_LOCAL.json",
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
