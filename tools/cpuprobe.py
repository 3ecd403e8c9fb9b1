"""Contention-robust A/B probe: total executor CPU time (and run time)
per query, summed over all stages of the reps' jobs via the UI REST API.
Wall clock on a noisy shared VM swings 3x between minutes; task CPU time
is stable, and optimization here targets CPU (plan shape), not the host.

Usage: python tools/cpuprobe.py name [name ...] [--reps N] [--sf DIR]
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
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    load_all()
    spark = get_spark(
        app_name="cpuprobe",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4048"},
    )
    # the configured port is a REQUEST — if it is taken Spark binds port+1
    # and a hardcoded URL would read a DIFFERENT application's stages
    # (ADVICE r13); uiWebUrl reports the port actually bound
    base = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{spark.sparkContext.applicationId}"
    out = {}
    for name in args.names:
        q = QUERIES[name]
        q(spark, args.sf).write.mode("overwrite").format("noop").save()  # warmup
        cpus, runs, walls = [], [], []
        for _ in range(args.reps):
            spark.catalog.clearCache()
            stages_before = {s["stageId"] for s in rest(base, "/stages")}
            t0 = time.time()
            q(spark, args.sf).write.mode("overwrite").format("noop").save()
            walls.append(round(time.time() - t0, 2))
            cpu = run = 0
            for s in rest(base, "/stages"):
                if s["stageId"] in stages_before or s.get("status") == "SKIPPED":
                    continue
                cpu += s.get("executorCpuTime", 0)
                run += s.get("executorRunTime", 0)
            cpus.append(round(cpu / 1e9, 2))
            runs.append(round(run / 1e3, 2))
        out[name] = {"cpu_s": min(cpus), "run_s": min(runs), "wall": min(walls), "all_cpu": cpus, "all_wall": walls}
        print(f"[cpuprobe] {name}: cpu={min(cpus)}s run={min(runs)}s wall={min(walls)}s", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
