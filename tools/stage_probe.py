"""Stage-level attribution for one query: run it once (noop sink) with the
UI REST endpoint on, then print per-job/per-stage wall, task counts, and
max-task share — the empirical half of guide §1 (where does the time GO:
how many jobs, which stages, how parallel are they really).

Usage: python tools/stage_probe.py <query> [--sf DIR] [--reps N] [--construct-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mapreducefw_spark.queries import QUERIES, load_all
from mapreducefw_spark.session import get_spark


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    load_all()
    spark = get_spark(
        app_name="stage-probe",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    # the configured port is a REQUEST — if it is taken Spark binds port+1
    # and a hardcoded URL would read a DIFFERENT application's stages
    # (ADVICE r13); uiWebUrl reports the port actually bound
    base = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{spark.sparkContext.applicationId}"

    q = QUERIES[args.name]
    # warmup (JIT/codegen)
    t0 = time.time()
    df = q(spark, args.sf)
    t_construct_cold = time.time() - t0
    df.write.mode("overwrite").format("noop").save()
    print(f"[stage_probe] cold: construct={t_construct_cold:.2f}s total={time.time()-t0:.2f}s")

    for rep in range(args.reps):
        spark.catalog.clearCache()
        jobs_before = {j["jobId"] for j in rest(base, "/jobs")}
        t0 = time.time()
        df = q(spark, args.sf)
        t_c = time.time() - t0
        df.write.mode("overwrite").format("noop").save()
        t_all = time.time() - t0
        jobs = [j for j in rest(base, "/jobs") if j["jobId"] not in jobs_before]
        print(f"\n=== rep {rep}: construct={t_c:.2f}s total={t_all:.2f}s, {len(jobs)} jobs ===")
        stages_seen = set()
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            sub = j.get("submissionTime", "?")[11:23]
            comp = j.get("completionTime", "?")[11:23]
            print(f"job {j['jobId']} [{sub} -> {comp}] stages={j['stageIds']} tasks={j['numTasks']} desc={ (j.get('description') or j.get('name',''))[:70] }")
            for sid in j["stageIds"]:
                if sid in stages_seen:
                    continue
                stages_seen.add(sid)
                try:
                    st = rest(base, f"/stages/{sid}")
                except Exception:
                    continue
                for attempt in st:
                    if attempt.get("status") == "SKIPPED":
                        continue
                    dur = None
                    if attempt.get("firstTaskLaunchedTime") and attempt.get("completionTime"):
                        from datetime import datetime

                        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                        try:
                            a = datetime.strptime(attempt["firstTaskLaunchedTime"], fmt)
                            b = datetime.strptime(attempt["completionTime"], fmt)
                            dur = (b - a).total_seconds()
                        except Exception:
                            pass
                    print(
                        f"  stage {sid}: tasks={attempt['numCompleteTasks']} wall={dur if dur is not None else '?'}s "
                        f"execRunMs={attempt.get('executorRunTime')} cpuMs={int(attempt.get('executorCpuTime',0)/1e6)} "
                        f"shufR={attempt.get('shuffleReadBytes',0)} shufW={attempt.get('shuffleWriteBytes',0)} "
                        f"in={attempt.get('inputBytes',0)} name={attempt.get('name','')[:60]}"
                    )


if __name__ == "__main__":
    main()
