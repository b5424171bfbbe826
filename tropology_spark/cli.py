"""Command-line entry point — run any declared query from a shell.

The usability surface a reference user gets on day one:

    python -m tropology_spark.cli list
    python -m tropology_spark.cli run flagship_revenue_by_region
    python -m tropology_spark.cli run graph_neighbors --sf-dir /root/testdata/sf0.01 --limit 5
    python -m tropology_spark.cli oracle dedup_exact     # print the DuckDB twin
    python -m tropology_spark.cli explain graph_triangles --mode formatted
    python -m tropology_spark.cli sql "SELECT count(*) AS n FROM lineitem"
    python -m tropology_spark.cli index quantizer ann_cells --path /data/idx  # train + persist bucketed

Output is JSON lines (one object per row) so results pipe into jq or
back into another job.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="tropology_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list declared query names")

    run = sub.add_parser("run", help="run a declared query, print JSON lines")
    run.add_argument("name")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    run.add_argument("--limit", type=int, default=20, help="max rows printed (0 = all)")

    orc = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    orc.add_argument("name")

    exp = sub.add_parser(
        "explain", help="print a declared query's physical plan"
    )
    exp.add_argument("name")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    exp.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "formatted", "codegen", "cost"],
    )

    sql = sub.add_parser(
        "sql", help="run ad-hoc Spark SQL over the fixture tables"
    )
    sql.add_argument("query", help="SQL text; fixture tables are registered as views")
    sql.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sql.add_argument("--limit", type=int, default=20, help="max rows printed (0 = all)")

    idx = sub.add_parser(
        "index",
        help="train + persist a bucketed index artifact, then print the"
        " reloaded head (round-trip proof)",
    )
    idx.add_argument(
        "kind", choices=["quantizer", "minhash", "ivf", "pq", "bq", "ivfpq"]
    )
    idx.add_argument("table", help="catalog table name for the artifact")
    idx.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    idx.add_argument("--path", default=None, help="explicit table location")
    idx.add_argument("--buckets", type=int, default=16)
    idx.add_argument("--limit", type=int, default=5, help="reloaded rows printed")

    args = parser.parse_args(argv)

    from tropology_spark import ORACLES, QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            kind = "sql-oracle" if name in ORACLES else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    if args.cmd == "oracle":
        if args.name not in ORACLES:
            print(f"no oracle for {args.name!r}", file=sys.stderr)
            return 1
        print(ORACLES[args.name].strip())
        return 0

    if args.cmd == "explain":
        if args.name not in QUERIES:
            print(f"unknown query {args.name!r}", file=sys.stderr)
            return 1
        from pyspark.sql import SparkSession

        from tropology_spark.session import get_spark

        owns_session = SparkSession.getActiveSession() is None
        spark = get_spark("tropology-cli")
        QUERIES[args.name](spark, args.sf_dir).explain(args.mode)
        if owns_session:
            spark.stop()
        return 0

    if args.cmd == "sql":
        from pyspark.sql import SparkSession

        from tropology_spark.session import get_spark
        from tropology_spark.sources.tables import register_views

        owns_session = SparkSession.getActiveSession() is None
        spark = get_spark("tropology-cli")
        register_views(spark, args.sf_dir)
        df = spark.sql(args.query)
        rows = df.collect() if args.limit == 0 else df.limit(args.limit).collect()
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
        if owns_session:
            spark.stop()
        return 0

    if args.cmd == "index":
        from pyspark.sql import SparkSession

        from tropology_spark.session import get_spark

        owns_session = SparkSession.getActiveSession() is None
        spark = get_spark("tropology-cli")
        if args.kind == "quantizer":
            from tropology_spark.operators.similarity import (
                quantizer_read_index,
                quantizer_write_index,
            )

            quantizer_write_index(
                spark, args.sf_dir, args.table,
                n_buckets=args.buckets, path=args.path,
            )
            re = quantizer_read_index(spark, args.table)
        elif args.kind == "ivf":
            from tropology_spark.operators.similarity import ivf_write_index

            ivf_write_index(
                spark, args.sf_dir, args.table,
                n_buckets=args.buckets, path=args.path,
            )
            re = spark.table(args.table)
        elif args.kind == "pq":
            from tropology_spark.operators.similarity import pq_write_index

            pq_write_index(
                spark, args.sf_dir, args.table,
                n_buckets=args.buckets, path=args.path,
            )
            re = spark.table(args.table)
        elif args.kind == "bq":
            from tropology_spark.operators.similarity import bq_write_index

            bq_write_index(
                spark, args.sf_dir, args.table,
                n_buckets=args.buckets, path=args.path,
            )
            re = spark.table(args.table)
        elif args.kind == "ivfpq":
            from tropology_spark.operators.similarity import ivfpq_write_index

            ivfpq_write_index(
                spark, args.sf_dir, args.table,
                n_buckets=args.buckets, path=args.path,
            )
            re = spark.table(args.table)
        else:
            from tropology_spark.operators.dedup import (
                minhash_read_index,
                minhash_write_index,
            )

            minhash_write_index(
                spark, args.sf_dir, args.table,
                n_buckets=args.buckets, path=args.path,
            )
            re = minhash_read_index(spark, args.table)
        for r in re.limit(args.limit).collect():
            print(json.dumps(r.asDict(), default=str))
        if owns_session:
            spark.stop()
        return 0

    if args.name not in QUERIES:
        print(f"unknown query {args.name!r}; try: python -m tropology_spark.cli list",
              file=sys.stderr)
        return 1
    from pyspark.sql import SparkSession

    from tropology_spark.session import get_spark

    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("tropology-cli")
    df = QUERIES[args.name](spark, args.sf_dir)
    rows = df.collect() if args.limit == 0 else df.limit(args.limit).collect()
    for r in rows:
        print(json.dumps(r.asDict(), default=str))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
