"""Regenerate OPERATORS.md from the live registry: python tools/gen_operators.py"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from data_ingestion_tool_spark.operators import registry  # noqa: E402

HEADER = """# OPERATORS — the registry, generated

Every entry is a named `(spark, sf_dir) -> DataFrame` builder exposed through
`__spark_entry__.queries()`. "oracle" = DuckDB ANSI-SQL differential check
(row count + schema + order-insensitive values at sf0.01 and sf0.1);
rows-only entries are engine-specific and property-tested instead
(see tests/test_ext_operators.py).

| query | check | tags | what it is |
|---|---|---|---|"""


def main() -> None:
    lines = [HEADER]
    reg = registry()
    for name, spec in sorted(reg.items()):
        check = "oracle" if spec.oracle else "rows-only"
        lines.append(
            f"| `{name}` | {check} | {' '.join(spec.tags)} | {spec.doc} |"
        )
    n_o = sum(1 for s in reg.values() if s.oracle)
    lines += ["", f"{len(reg)} queries, {n_o} oracle-checked.", ""]
    out = os.path.join(os.path.dirname(__file__), "..", "OPERATORS.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {len(reg)} queries ({n_o} oracles)")


if __name__ == "__main__":
    main()
