"""Parse a Spark event log (plain file or rolling zstd dir) into the
per-query breakdown r14_profile.py prints.

Usage: python scripts/r14_parse_eventlog.py <eventlog-file-or-dir>
"""

from __future__ import annotations

import glob
import io
import json
import os
import sys


def iter_lines(path: str):
    if os.path.isdir(path):
        files = sorted(
            glob.glob(os.path.join(path, "events_*")),
            key=lambda f: int(os.path.basename(f).split("_")[1]),
        )
    else:
        files = [path]
    for f in files:
        if f.endswith(".zstd"):
            import pyarrow as pa

            with pa.input_stream(f, compression="zstd") as s:
                data = s.read()
            yield from io.BytesIO(data).read().decode().splitlines()
        else:
            with open(f) as fh:
                yield from fh.read().splitlines()


def parse(path: str):
    jobs_by_group: dict[str, list[dict]] = {}
    stages: dict[int, dict] = {}
    task_metrics: dict[int, dict] = {}
    job_index: dict[int, dict] = {}
    for line in iter_lines(path):
        if not line.strip():
            continue
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            grp = (ev.get("Properties") or {}).get("spark.jobGroup.id", "")
            j = {
                "job": ev["Job ID"],
                "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                "t0": ev["Submission Time"],
            }
            jobs_by_group.setdefault(grp, []).append(j)
            job_index[ev["Job ID"]] = j
        elif e == "SparkListenerJobEnd":
            j = job_index.get(ev["Job ID"])
            if j is not None:
                j["t1"] = ev["Completion Time"]
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "sub": si.get("Submission Time"),
                "done": si.get("Completion Time"),
                "ntask": si["Number of Tasks"],
                "name": si["Stage Name"],
            }
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            agg = task_metrics.setdefault(
                sid,
                {
                    "run": 0, "deser": 0, "ser": 0, "gc": 0,
                    "fetch": 0, "shwrite": 0, "cpu": 0, "n": 0,
                },
            )
            agg["run"] += m.get("Executor Run Time", 0)
            agg["deser"] += m.get("Executor Deserialize Time", 0)
            agg["ser"] += m.get("Result Serialization Time", 0)
            agg["gc"] += m.get("JVM GC Time", 0)
            agg["cpu"] += m.get("Executor CPU Time", 0) / 1e6
            sr = m.get("Shuffle Read Metrics") or {}
            agg["fetch"] += sr.get("Fetch Wait Time", 0)
            sw = m.get("Shuffle Write Metrics") or {}
            agg["shwrite"] += sw.get("Shuffle Write Time", 0) / 1e6
            agg["n"] += 1
    return jobs_by_group, stages, task_metrics


def main() -> None:
    path = sys.argv[1]
    jobs_by_group, stages, task_metrics = parse(path)
    out = []
    for grp, jobs in jobs_by_group.items():
        if not grp.startswith("t_"):
            continue
        name = grp[2:]
        sids = sorted({s for j in jobs for s in j["stages"]})
        exec_sids = [s for s in sids if s in stages]
        job_wall = sum((j.get("t1", j["t0"]) - j["t0"]) / 1000.0 for j in jobs)
        ntasks = sum(stages[s]["ntask"] for s in exec_sids)
        agg = {
            k: round(
                sum(task_metrics.get(s, {}).get(k, 0) for s in exec_sids) / 1000.0,
                3,
            )
            for k in ("run", "deser", "ser", "gc", "fetch", "cpu", "shwrite")
        }
        nrun = sum(task_metrics.get(s, {}).get("n", 0) for s in exec_sids)
        out.append(
            {
                "q": name,
                "jobs": len(jobs),
                "job_wall": round(job_wall, 3),
                "stages_planned": len(sids),
                "stages_run": len(exec_sids),
                "tasks": ntasks,
                "tasks_run": nrun,
                **agg,
            }
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
