"""Query registry plumbing.

Every operator the engine claims (SURVEY.md §2) is declared as a
:class:`QuerySpec`: a named PySpark builder ``(spark, sf_dir) ->
DataFrame`` plus, where SQL-expressible, the equivalent ANSI SQL the
DuckDB oracle runs on the same parquet tables. ``__spark_entry__``
assembles its ``queries()`` / ``oracle_sql()`` contract from this
registry, and ``bench.py`` picks its headline set from it.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    """One named, oracle-checkable query/operator."""

    name: str
    builder: Builder
    #: DuckDB-runnable ANSI SQL over the pre-registered table views, or
    #: None for non-SQL-expressible operators (driver then records a
    #: weaker rows-only check).
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


def build_registry(*spec_lists: list[QuerySpec]) -> dict[str, QuerySpec]:
    registry: dict[str, QuerySpec] = {}
    for specs in spec_lists:
        for spec in specs:
            if spec.name in registry:
                raise ValueError(f"duplicate query name: {spec.name}")
            registry[spec.name] = spec
    return registry
