"""Shared Column-expression helpers.

Determinism-across-engines conventions (used by every operator that is
oracle-checked against DuckDB):

- **Money/measure aggregation** goes through decimal: the testdata
  doubles are nominally 2-decimal values, so ``cast(x AS DECIMAL(12,2))``
  recovers the intended exact decimal identically in Spark and DuckDB,
  decimal sums are exact (order-insensitive), and the final
  ``cast(... AS DOUBLE)`` is the same IEEE value on both engines. A
  plain ``SUM(double)`` would depend on partition/accumulation order.
- **Averages** are computed as ``decimal_sum_as_double / count`` (one
  deterministic double division) rather than engine-native ``AVG``
  whose internal types differ.
- **Every computed column is aliased**; oracle SQL uses the same alias.

These add one cast per input value — negligible against shuffle cost,
and whole-stage codegen keeps them JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type wide enough for TPC-H-ish money columns; products of
#: three of these stay within Spark's DECIMAL(38,x) cap.
DEC = "decimal(12,2)"


def dec(col: str | Column) -> Column:
    """Exact-decimal view of a nominally-2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dec_sum(col: str | Column, alias: str) -> Column:
    """Order-insensitive, engine-exact sum of a money column → double."""
    return F.sum(dec(col)).cast("double").alias(alias)


def dec_avg(col: str | Column, alias: str) -> Column:
    """Deterministic mean: exact decimal sum → double, / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def revenue() -> Column:
    """``l_extendedprice * (1 - l_discount)`` in exact decimal."""
    return dec("l_extendedprice") * (F.lit(1).cast(DEC) - dec("l_discount"))


def charge() -> Column:
    """``l_extendedprice * (1 - l_discount) * (1 + l_tax)`` exact."""
    return revenue() * (F.lit(1).cast(DEC) + dec("l_tax"))


#: The oracle-SQL spelling of the same conventions.
SQL_DEC = "DECIMAL(12,2)"


def sql_dec_sum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) AS {alias}"


def sql_dec_avg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS {SQL_DEC})) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )


SQL_REVENUE = (
    "(CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))"
)

SQL_CHARGE = (
    f"({SQL_REVENUE} * "
    "(CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))"
)
