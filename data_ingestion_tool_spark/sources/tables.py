"""Parquet table loaders for the benchmark/test star schema.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file per table under
a scale-factor directory.

At cluster scale the same loader reads a partitioned parquet/Delta
prefix; nothing here assumes single-file inputs. Column pruning and
predicate pushdown come from reading lazily (``spark.read.parquet``)
and never caching eagerly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables a planner should broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # The events table is written with TIMESTAMP(NANOS), which the
        # vectorized parquet reader rejects outright unless this legacy
        # conf is on. It is a runtime-settable SQLConf, so set it here
        # rather than at session build: callers (the external harness
        # included) may hand us an arbitrary unconfigured SparkSession.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # With spark.sql.legacy.parquet.nanosAsLong the TIMESTAMP(NANOS)
        # column arrives as long nanos; truncate to µs (DuckDB parity).
        field = dict((f.name, f.dataType) for f in df.schema.fields).get("ts")
        if isinstance(field, LongType):
            # Integer div, not `/`: float division of ~1e18 ns loses µs
            # precision in the double mantissa.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works on it."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
