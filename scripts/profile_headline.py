"""Per-stage profiling of the headline bench queries (guide §1/§7).

Runs each headline query once (after one unmeasured warm rep, same
noop-sink methodology as bench.py) inside a session with event logging
enabled, labels jobs with the query name, then parses the event log to
attribute stage wall-time and task metrics (shuffle bytes, fetch wait,
executor run time, GC) back to queries. Output: one JSON file with a
per-query list of stages sorted by duration.

Usage: python scripts/profile_headline.py [out.json] [--only a,b,c]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from amazonmsk_emr_tem_data_spark.session import get_spark  # noqa: E402
from amazonmsk_emr_tem_data_spark.queries import (  # noqa: E402
    BENCH_HEADLINE,
    REGISTRY,
)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_headline.json"
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evt_dir = "/tmp/spark-events-profile"
    os.makedirs(evt_dir, exist_ok=True)
    import shutil

    for f in os.listdir(evt_dir):
        p = os.path.join(evt_dir, f)
        shutil.rmtree(p) if os.path.isdir(p) else os.unlink(p)
    spark = get_spark(
        "profile-headline",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evt_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext

    names = [
        n
        for n in BENCH_HEADLINE
        if n in REGISTRY and (only is None or n in only)
    ]
    wall: dict[str, float] = {}
    # one global warm (JVM + parquet footers)
    REGISTRY["tem_hourly_avg"][0](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        fn, _ = REGISTRY[name]
        sc.setJobDescription(f"warm::{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        sc.setJobDescription(f"meas::{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        sc.setJobDescription(None)
    spark.stop()

    # parse the event log (Spark 4 rolling layout: a directory of
    # events_* part files; fall back to the flat single-file layout)
    logs = sorted(
        (os.path.join(evt_dir, f) for f in os.listdir(evt_dir)),
        key=os.path.getmtime,
    )
    latest = logs[-1]
    if os.path.isdir(latest):
        logs = sorted(
            (
                os.path.join(latest, f)
                for f in os.listdir(latest)
                if f.startswith("events_")
            ),
        )
    else:
        logs = [latest]
    job_desc: dict[int, str] = {}       # jobId -> description
    stage_job: dict[int, int] = {}      # stageId -> jobId
    stages: dict[int, dict] = {}        # stageId -> facts
    stage_tasks: dict[int, dict] = {}
    def _lines():
        for lp in logs:
            if lp.endswith(".zstd"):
                import io

                import zstandard

                with open(lp, "rb") as fb:
                    reader = zstandard.ZstdDecompressor().stream_reader(fb)
                    yield from io.TextIOWrapper(reader, encoding="utf-8")
            else:
                with open(lp) as f:
                    yield from f

    for line in _lines():
        if True:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                job_desc[jid] = desc
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = jid
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages[sid] = {
                    "stage": sid,
                    "name": si.get("Stage Name", "")[:120],
                    "tasks": si.get("Number of Tasks"),
                    "wall_ms": (comp - sub) if sub and comp else None,
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                agg = stage_tasks.setdefault(
                    sid,
                    {
                        "run_ms": 0,
                        "gc_ms": 0,
                        "fetch_wait_ms": 0,
                        "shuf_read_b": 0,
                        "shuf_write_b": 0,
                        "input_b": 0,
                        "py_ms": 0,
                    },
                )
                agg["run_ms"] += m.get("Executor Run Time", 0)
                agg["gc_ms"] += m.get("JVM GC Time", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                agg["fetch_wait_ms"] += srm.get("Fetch Wait Time", 0)
                agg["shuf_read_b"] += srm.get("Remote Bytes Read", 0) + srm.get(
                    "Local Bytes Read", 0
                )
                swm = m.get("Shuffle Write Metrics") or {}
                agg["shuf_write_b"] += swm.get("Shuffle Bytes Written", 0)
                im = m.get("Input Metrics") or {}
                agg["input_b"] += im.get("Bytes Read", 0)

    per_query: dict[str, dict] = {}
    for sid, s in stages.items():
        jid = stage_job.get(sid)
        desc = job_desc.get(jid, "")
        if not desc.startswith("meas::"):
            continue
        qname = desc[len("meas::"):]
        q = per_query.setdefault(
            qname, {"wall_s": wall.get(qname), "n_stages": 0, "stages": []}
        )
        q["n_stages"] += 1
        row = dict(s)
        row.update(stage_tasks.get(sid, {}))
        q["stages"].append(row)
    for q in per_query.values():
        q["stages"].sort(key=lambda r: -(r.get("wall_ms") or 0))
        q["sum_stage_wall_ms"] = sum(r.get("wall_ms") or 0 for r in q["stages"])
        q["stages"] = q["stages"][:12]
    with open(out_path, "w") as f:
        json.dump(
            {"sf_dir": sf_dir, "wall": wall, "per_query": per_query}, f, indent=1
        )
    print(json.dumps({"out": out_path, "total_wall": round(sum(wall.values()), 2)}))


if __name__ == "__main__":
    main()
