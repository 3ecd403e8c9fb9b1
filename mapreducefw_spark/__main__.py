"""CLI parity with the reference's `Search` binary plus a query runner.

Reference usage (``/root/reference/Search.cpp:53-66``):
    Search <substring> <dir> [<dir> ...]   -> matching filenames, sorted,
                                              space-separated
Here:
    python -m mapreducefw_spark search <substring> <dir> [<dir> ...]
    python -m mapreducefw_spark run <query-name> [--sf-dir DIR]
    python -m mapreducefw_spark list
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="mapreducefw_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_search = sub.add_parser("search", help="Search-client parity: filenames containing substring")
    p_search.add_argument("substring")
    p_search.add_argument("dirs", nargs="+")

    p_run = sub.add_parser("run", help="run a registered query and print its rows")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)

    sub.add_parser("list", help="list registered queries")

    args = parser.parse_args(argv)

    from mapreducefw_spark.queries import ORACLES, QUERIES, load_all

    load_all()

    if args.cmd == "list":
        for name in sorted(QUERIES):
            print(f"{name}\t{'oracle' if name in ORACLES else 'rows-only'}")
        return 0

    from mapreducefw_spark.session import get_spark

    spark = get_spark(app_name=f"mapreducefw-{args.cmd}")

    if args.cmd == "search":
        from mapreducefw_spark.sources.filesystem import search

        out = search(spark, args.substring, args.dirs)
        # reference prints keys space-separated (Search.cpp:44-49)
        print(" ".join(r.key for r in out.collect()))
        return 0

    if args.query not in QUERIES:
        print(f"unknown query: {args.query} (see `list`)", file=sys.stderr)
        return 2
    df = QUERIES[args.query](spark, args.sf_dir)
    for row in df.limit(args.limit).collect():
        print("\t".join("" if v is None else str(v) for v in row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
