"""Staleness report for the driver's checked-50 rotation: for every
registered query, the newest CORRECTNESS_r{N}.json round that recorded it,
so each round's CHECK_PRIORITY can be planned from data instead of
re-derived by hand.

Usage: python tools/stale_report.py
Prints: never-checked oracle-paired queries, the vintage histogram, and the
stalest-first queue (oracle-paired only — rows-only queries stay out of the
window per the no-oracle rule).
"""

from __future__ import annotations

import glob
import json
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mapreducefw_spark.queries import ORACLES, QUERIES, load_all


def main() -> None:
    load_all()
    repo = Path(__file__).resolve().parent.parent
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", Path(f).stem).group(1))
        try:
            rec = json.loads(Path(f).read_text())
        except Exception:
            continue
        for name in rec:
            latest[name] = max(latest.get(name, 0), rnd)

    never = [n for n in QUERIES if n not in latest and n in ORACLES]
    never_rows_only = [n for n in QUERIES if n not in latest and n not in ORACLES]
    print(f"registered: {len(QUERIES)}  oracle-paired: {len(ORACLES)}")
    print(f"\nnever driver-checked, oracle-paired ({len(never)}):")
    for n in never:
        print(f"  {n}")
    # rows-only queries normally stay out of the window (the no-oracle
    # rule); the r10 window spent 6 explicit slots on the never-recorded
    # ones (WINDOW_ROWS_ONLY allowlist) so every query holds SOME driver
    # record — after r10 this list should stay empty
    print(
        f"\nnever driver-checked, rows-only-by-design ({len(never_rows_only)}):"
        + (" none" if not never_rows_only else "")
    )
    for n in never_rows_only:
        print(f"  {n}")
    vintages = Counter(latest[n] for n in latest if n in QUERIES)
    print("\nvintage histogram (latest driver row -> count):")
    for rnd in sorted(vintages):
        print(f"  r{rnd}: {vintages[rnd]}")
    print("\nstalest-first queue (oracle-paired, by vintage then name):")
    pool = sorted(
        (n for n in QUERIES if n in ORACLES and n in latest),
        key=lambda n: (latest[n], n),
    )
    for n in pool[:60]:
        print(f"  r{latest[n]}  {n}")
    if len(pool) > 60:
        print(f"  ... {len(pool) - 60} more")


if __name__ == "__main__":
    main()
