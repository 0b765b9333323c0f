"""Job-level profile of one declared query: runs it once (optionally twice
— cold then warm) with the Spark event log enabled, then prints each job's
wall time, gap since the previous job, stage names, and task counts. The
gaps expose driver-side / filesystem fixed costs the task metrics never
show.

Usage: python tools/profile_query.py q_name [--sf DIR] [--warm]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from endtoend_etl_openmeteo_spark import plans  # noqa: E402
from endtoend_etl_openmeteo_spark.session import (  # noqa: E402
    get_spark,
    release_persistent_rdds,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", action="store_true", help="run twice, profile the 2nd")
    args = ap.parse_args()

    log_dir = tempfile.mkdtemp(prefix="spark_events_")
    spark = get_spark(
        "profile_query",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
        },
    )
    registry = plans.load_all()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(registry["q_scan"].fn(spark, args.sf))
    runs = 2 if args.warm else 1
    marks = []
    for _ in range(runs):
        t0 = time.perf_counter()
        noop(registry[args.query].fn(spark, args.sf))
        marks.append((t0, time.perf_counter()))
        release_persistent_rdds(spark)
    print(f"run walls: {[round(b - a, 3) for a, b in marks]}", file=sys.stderr)
    spark.stop()

    logs = sorted(
        p for p in Path(log_dir).rglob("*") if p.is_file() and "appstatus" not in p.name
    )
    events = []
    with open(logs[-1]) as f:
        for line in f:
            try:
                events.append(json.loads(line))
            except Exception:
                pass
    jobs = {}
    stage_names = {}
    for e in events:
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            jobs[jid] = {
                "start": e["Submission Time"],
                "desc": (e.get("Properties") or {}).get(
                    "spark.job.description", ""
                )[:80],
                "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                "ntasks": sum(
                    s.get("Number of Tasks", 0) for s in e.get("Stage Infos", [])
                ),
            }
            for s in e.get("Stage Infos", []):
                stage_names[s["Stage ID"]] = s.get("Stage Name", "")[:60]
        elif ev == "SparkListenerJobEnd":
            if e["Job ID"] in jobs:
                jobs[e["Job ID"]]["end"] = e["Completion Time"]
    prev_end = None
    total_job = 0.0
    total_gap = 0.0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        dur = (j["end"] - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = j["end"]
        total_job += dur
        total_gap += max(0.0, gap)
        names = "; ".join(
            sorted({stage_names.get(s, "") for s in j["stages"]})
        )[:100]
        print(
            f"job {jid:4d}  dur={dur:7.3f}s gap={gap:7.3f}s tasks={j['ntasks']:4d}"
            f"  {j['desc'] or names}"
        )
    print(f"TOTAL job time {total_job:.2f}s, inter-job gaps {total_gap:.2f}s")


if __name__ == "__main__":
    main()
