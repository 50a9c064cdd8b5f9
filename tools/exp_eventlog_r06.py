"""Run one bench leg of near_dedup_e2e + substring_pass with the Spark event
log on, then parse per-stage wall / task counts to find parallelism collapses
and overhead-dominated stages."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOGDIR = "/tmp/sparklogs_r06"


def main():
    os.makedirs(LOGDIR, exist_ok=True)
    os.environ.setdefault("SPARK_DRIVER_MEM", "32g")
    from bigtrees_spark.session import get_spark

    from bench import run_dedup, run_substring, _sf_dir

    spark = get_spark(
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        app_name="eventlog_r06",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{LOGDIR}",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = _sf_dir()
    warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    run_dedup(spark, warm)
    run_substring(spark, warm)
    spark.sparkContext.setJobDescription("NEAR_DEDUP_LEG")
    t0 = time.time()
    run_dedup(spark, sf_dir)
    print(f"near_dedup leg: {round(time.time()-t0,3)}s")
    spark.sparkContext.setJobDescription("SUBSTRING_LEG")
    t0 = time.time()
    run_substring(spark, sf_dir)
    print(f"substring leg: {round(time.time()-t0,3)}s")
    spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()
    parse(os.path.join(LOGDIR, app_id))


def parse(path):
    jobs = {}  # jobId -> (desc, submit, end)
    stages = {}  # stageId -> dict
    stage_job = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get("spark.job.description", "")
                jid = ev["Job ID"]
                jobs[jid] = {"desc": desc, "t0": ev["Submission Time"], "stages": []}
                for s in ev.get("Stage Infos", []):
                    stage_job[s["Stage ID"]] = jid
                    jobs[jid]["stages"].append(s["Stage ID"])
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                stages[sid] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "wall_ms": (com - sub) if (sub and com) else None,
                }
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        desc = j["desc"]
        if desc not in ("NEAR_DEDUP_LEG", "SUBSTRING_LEG"):
            continue
        print(f"\njob {jid} [{desc}] wall={j['t1']-j['t0']}ms")
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if s and s["wall_ms"] is not None:
                print(f"  stage {sid:4d} tasks={s['tasks']:4d} wall={s['wall_ms']:6d}ms  {s['name']}")


if __name__ == "__main__":
    main()
