"""Command-line entry point: the operational surface a user of the
reference tool would reach for, over this engine's registry.

    python -m data_ingestion_tool_spark list [--tag TAG]
    python -m data_ingestion_tool_spark run QUERY [--sf-dir D] [--limit N]
        [--out PATH]          # parquet result instead of stdout
    python -m data_ingestion_tool_spark sql "SELECT ..." [--sf-dir D]
        # the reference's spark.sql delegation (box_export.py:36):
        # every testdata table is pre-registered as a view
    python -m data_ingestion_tool_spark explain QUERY [--sf-dir D]

Exit code 0 on success; unknown query names list near matches.
"""

from __future__ import annotations

import argparse
import difflib
import os
import sys

_DEFAULT_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _spark():
    from data_ingestion_tool_spark import get_spark

    spark = get_spark("data_ingestion_tool_spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _register_views(spark, sf_dir: str) -> None:
    from data_ingestion_tool_spark.sources.tables import load_table

    for t in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def cmd_list(args) -> int:
    from data_ingestion_tool_spark.operators import registry

    for name, spec in registry().items():
        if args.tag and args.tag not in spec.tags:
            continue
        kind = "oracle" if spec.oracle else "rows-only"
        tags = ",".join(spec.tags)
        print(f"{name:40s} {kind:9s} {tags:20s} {spec.doc}")
    return 0


def _resolve(name: str):
    from data_ingestion_tool_spark.operators import registry

    reg = registry()
    if name in reg:
        return reg[name]
    near = difflib.get_close_matches(name, reg, n=5)
    print(f"unknown query {name!r}; close matches: {near}", file=sys.stderr)
    return None


def cmd_run(args) -> int:
    spec = _resolve(args.query)
    if spec is None:
        return 2
    spark = _spark()
    df = spec.builder(spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    return 0


def cmd_sql(args) -> int:
    spark = _spark()
    _register_views(spark, args.sf_dir)
    df = spark.sql(args.statement)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    return 0


def cmd_explain(args) -> int:
    spec = _resolve(args.query)
    if spec is None:
        return 2
    from data_ingestion_tool_spark.plans import formatted_plan

    spark = _spark()
    print(formatted_plan(spec.builder(spark, args.sf_dir)))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="data_ingestion_tool_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list registered queries")
    lp.add_argument("--tag", help="filter by tag")
    lp.set_defaults(fn=cmd_list)

    rp = sub.add_parser("run", help="run a registered query")
    rp.add_argument("query")
    rp.add_argument("--sf-dir", default=_DEFAULT_SF)
    rp.add_argument("--limit", type=int, default=20)
    rp.add_argument("--out", help="write parquet here instead of stdout")
    rp.set_defaults(fn=cmd_run)

    sp = sub.add_parser("sql", help="run arbitrary SQL over the tables")
    sp.add_argument("statement")
    sp.add_argument("--sf-dir", default=_DEFAULT_SF)
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--out", help="write parquet here instead of stdout")
    sp.set_defaults(fn=cmd_sql)

    ep = sub.add_parser("explain", help="formatted physical plan")
    ep.add_argument("query")
    ep.add_argument("--sf-dir", default=_DEFAULT_SF)
    ep.set_defaults(fn=cmd_explain)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
