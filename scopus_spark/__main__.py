"""CLI for the snapshot-extraction pipeline (mirrors the reference's UX).

    python -m scopus_spark render-snapshot --sf-dir /root/testdata/sf0.001 --output /tmp/snap
    python -m scopus_spark extract --input /tmp/snap --output /tmp/extracted
"""

from __future__ import annotations

import argparse
import sys

from scopus_spark import etl
from scopus_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser(prog="scopus_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("render-snapshot", help="render documents as an XML snapshot")
    r.add_argument("--sf-dir", required=True)
    r.add_argument("--output", required=True)
    r.add_argument(
        "--zips", action="store_true",
        help="render the vendor delivery shape (ZIP archives of per-record XML)",
    )

    e = sub.add_parser("extract", help="snapshot -> normalized parquet tables")
    e.add_argument("--input", required=True)
    e.add_argument("--output", required=True)
    e.add_argument(
        "--zips", action="store_true",
        help="input is a directory of ZIP archives instead of bare XML files",
    )

    m = sub.add_parser(
        "merge", help="MERGE a delta XML snapshot into extracted tables"
    )
    m.add_argument("--input", required=True)
    m.add_argument("--target", required=True)

    x = sub.add_parser(
        "explain", help="print the physical plan of a declared query key"
    )
    x.add_argument("key", help="SURVEY §2 key, e.g. d2, c8, o1")
    x.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    x.add_argument(
        "--mode", default="formatted",
        choices=["simple", "extended", "formatted", "cost", "codegen"],
    )

    args = ap.parse_args()
    if args.cmd == "explain":
        # validate before paying SparkSession startup
        from scopus_spark import registry

        if args.key not in registry.all_queries():
            sys.exit(
                f"unknown key {args.key!r}; declared: "
                + " ".join(sorted(registry.all_queries()))
            )
    spark = get_spark(app_name=f"scopus_spark_{args.cmd}")
    if args.cmd == "render-snapshot":
        if args.zips:
            etl.render_snapshot_zips(spark, args.sf_dir, args.output)
        else:
            etl.render_snapshot(spark, args.sf_dir, args.output)
        print(f"snapshot written to {args.output}")
    elif args.cmd == "extract":
        extract = etl.extract_snapshot_zips if args.zips else etl.extract_snapshot
        tables = extract(spark, args.input, args.output)
        for name, df in tables.items():
            print(f"{name}: {df.count()} rows -> {args.output}/{name}")
    elif args.cmd == "merge":
        tables = etl.merge_snapshot(spark, args.input, args.target)
        for name, df in tables.items():
            print(f"{name}: merged {df.count()} delta rows -> {args.target}/{name}")
    else:
        from scopus_spark import registry

        queries = registry.all_queries()
        if args.key not in queries:
            sys.exit(f"unknown key {args.key!r}; declared: {' '.join(sorted(queries))}")
        queries[args.key](spark, args.sf_dir).explain(mode=args.mode)


if __name__ == "__main__":
    main()
