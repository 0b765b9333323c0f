"""Standalone per-query timer + plan capture for optimization work.

Usage:
    python tools/time_query.py q_name [q_name ...] [--n 3] [--sf DIR]
        [--explain OUTDIR]

Runs each named query against the noop sink `--n` times in one fresh
session (first run = cold/compile, rest = warm), interleaving a q_scan
sentinel before each run, and prints one JSON line per query:
{"q": name, "times": [...], "sentinel": [...], "steal_pct": [...]}.
With --explain, writes `.explain("formatted")` to OUTDIR/<q>_<tag>.txt.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from endtoend_etl_openmeteo_spark import plans  # noqa: E402
from endtoend_etl_openmeteo_spark.session import (  # noqa: E402
    get_spark,
    release_persistent_rdds,
)


def _cpu():
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return sum(vals), vals[7] if len(vals) > 7 else 0
    except Exception:
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--explain", default=None)
    ap.add_argument("--tag", default="plan")
    args = ap.parse_args()

    registry = plans.load_all()
    spark = get_spark("time_query")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(registry["q_scan"].fn(spark, args.sf))  # warm JVM

    for name in args.queries:
        spec = registry[name]
        if args.explain:
            out = Path(args.explain)
            out.mkdir(parents=True, exist_ok=True)
            df = spec.fn(spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            (out / f"{name}_{args.tag}.txt").write_text(txt)
            release_persistent_rdds(spark)
        times, sent, steal = [], [], []
        for _ in range(args.n):
            t0 = time.perf_counter()
            noop(registry["q_scan"].fn(spark, args.sf))
            sent.append(round(time.perf_counter() - t0, 3))
            c0 = _cpu()
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            noop(spec.fn(spark, args.sf))
            times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            c1 = _cpu()
            steal.append(
                round(100.0 * (c1[1] - c0[1]) / max(1, c1[0] - c0[0]), 2)
                if c0 and c1
                else None
            )
            release_persistent_rdds(spark)
        print(
            json.dumps(
                {"q": name, "times": times, "sentinel": sent, "steal_pct": steal}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
