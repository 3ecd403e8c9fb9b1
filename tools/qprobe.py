"""Per-query optimization probe: isolated timing + plan capture.

Usage: python tools/qprobe.py [--tag TAG] [--reps N] [--sf DIR] name [name ...]

For each named query: one untimed warmup, then N timed noop-sink reps
(min reported), and the .explain("formatted") text written to
plans/<round>/<name>_<tag>.txt (--round, default r14). Session config matches bench.py (get_spark with
$SPARK_GRAFT_CPUS), so probe numbers are comparable to BENCH_FULL entries.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mapreducefw_spark.queries import QUERIES, load_all
from mapreducefw_spark.session import get_spark


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default=None, help="suffix for the plan file (e.g. before/after); omit to skip plan dump")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--round", default="r14", help="plans/ subdir for --tag dumps")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    load_all()
    spark = get_spark(app_name="qprobe", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out = {}
    for name in args.names:
        q = QUERIES[name]
        df = q(spark, args.sf)
        if args.tag:
            pdir = REPO / "plans" / args.round
            pdir.mkdir(parents=True, exist_ok=True)
            (pdir / f"{name}_{args.tag}.txt").write_text(formatted_plan(df))
        spark.sparkContext.setJobDescription(f"qprobe warmup {name}")
        df.write.mode("overwrite").format("noop").save()
        times = []
        for r in range(args.reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"qprobe {name} rep{r}")
            t0 = time.time()
            q(spark, args.sf).write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        out[name] = {"min": min(times), "times": times}
        print(f"[qprobe] {name}: min={min(times)} times={times}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
