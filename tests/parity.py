"""Spark-vs-DuckDB comparison mimicking the driver's correctness gate:
row count + column names + order-insensitive value comparison with
columns sorted by name. Values are compared EXACTLY (strings of every
cell) so that any hash the driver computes will also match.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pandas as pd


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        # repr() round-trips doubles exactly
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, (int,)):
        return str(int(v))
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def compare(spark_df, duck_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    if sorted(spdf.columns) != sorted(duck_df.columns):
        problems.append(
            f"column mismatch: spark={sorted(spdf.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(spdf) != len(duck_df):
        problems.append(f"row count: spark={len(spdf)} duck={len(duck_df)}")
    a = canonical_rows(spdf)
    b = canonical_rows(duck_df)
    if a != b:
        diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
        sample = diffs[:3]
        for i in sample:
            problems.append(f"row {i}: spark={a[i]} duck={b[i]}")
        if len(a) == len(b) and not sample:
            problems.append("length equal but tail rows differ")
        elif not sample:
            problems.append("row sets differ in length tail")
    return problems
