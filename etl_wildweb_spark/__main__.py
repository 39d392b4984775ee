"""spark-submit / python -m entry point (SURVEY.md §2 A22).

The reference has dual entry points: a dev-server top-level ``local()``
run and the exported Lambda ``handler`` (/root/reference/task.ts:161-164).
The engine's duals are the importable driver contract
(``__spark_entry__.entry`` / ``queries()``) and THIS module:

    spark-submit --master local[8] -m etl_wildweb_spark ...   # cluster
    python -m etl_wildweb_spark --query flagship_revenue_by_nation

Runs one registered query (or lists them) against a corpus directory
and prints row count + schema as one JSON line — a driver-shaped CLI,
not a second code path: it calls the same registry the driver does.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_wildweb_spark")
    ap.add_argument("--sf-dir", default=None, help="corpus directory")
    ap.add_argument("--query", default=None, help="registered query name")
    ap.add_argument("--list", action="store_true", help="list query names")
    ap.add_argument(
        "--explain", action="store_true", help="print the formatted physical plan"
    )
    args = ap.parse_args(argv)

    from . import registry
    from .io import DEFAULT_SF_DIR
    from .session import get_spark

    registry.load_all()
    if args.list or not args.query:
        for name in sorted(registry.QUERIES):
            checked = "oracle" if name in registry.ORACLES else "rows-only"
            print(f"{name}\t{checked}")
        return 0

    fn = registry.QUERIES.get(args.query)
    if fn is None:
        print(f"unknown query {args.query!r}; use --list", file=sys.stderr)
        return 2

    spark = get_spark(f"etl-wildweb-spark:{args.query}")
    df = fn(spark, args.sf_dir or DEFAULT_SF_DIR)
    if args.explain:
        print(df._jdf.queryExecution().explainString("formatted"))
        return 0
    n = df.count()
    print(
        json.dumps(
            {"query": args.query, "rows": n, "schema": df.schema.simpleString()}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
