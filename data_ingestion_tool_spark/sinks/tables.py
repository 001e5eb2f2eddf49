"""Managed-table sinks: main table, error/quarantine table, audit log.

Reference behavior preserved (SURVEY.md §2.2):

- appends carry ``process_dt = from_utc_timestamp(current_timestamp(),
  'Asia/Shanghai')`` — ingestion timestamps are China-local wall-clock
  (box_ingest.py:126, :167)
- rejected rows land in a sibling ``<table>_error`` table with columns
  (record, error_type, process_dt) (box_ingest.py:115-125)
- an audit table records (task_owner, job_action, log_info, process_dt)
  (box_ingest.py:13-20)

Deliberate changes, each a scale or correctness fix:

- **Format fallback**: Delta when delta-spark is importable, else
  parquet ``saveAsTable`` — same catalog surface either way.
- **One commit per table per run**: callers union their batch before
  writing; the reference commits once per file (box_ingest.py:127),
  which at 100 TB means millions of tiny commits + small files.
- **No f-string SQL**: the reference interpolates log values into an
  INSERT (box_ingest.py:14-18) and breaks on a quote (SQL injection);
  log rows here travel as DataFrame literals, and the AuditLog buffers
  so a run is one log commit, not 3-6 per file.
"""

from __future__ import annotations

import datetime
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PROCESS_TZ = "Asia/Shanghai"


def _table_format() -> str:
    try:
        import delta  # type: ignore  # noqa: F401

        return "delta"
    except ImportError:
        return "parquet"


TABLE_FORMAT = _table_format()


def process_dt_col() -> F.Column:
    return F.from_utc_timestamp(F.current_timestamp(), PROCESS_TZ)


def qualified(table_name: str, catalog: str | None, schema: str | None) -> str:
    parts = [p for p in (catalog, schema, table_name) if p]
    return ".".join(parts)


def append_table(
    df: DataFrame,
    table_name: str,
    *,
    catalog: str | None = None,
    schema: str | None = None,
    add_process_dt: bool = True,
    partition_by: list[str] | None = None,
) -> None:
    """Single-transaction append (one call per table per run).

    ``partition_by`` prunes at scale: a table partitioned by ingest
    date (or any low-cardinality key) lets every downstream filter on
    that key skip whole directories (partition pruning), and
    concurrent writers touch disjoint partitions.
    """
    if add_process_dt:
        df = df.withColumn("process_dt", process_dt_col())
    writer = df.write.format(TABLE_FORMAT).mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(qualified(table_name, catalog, schema))


def write_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    catalog: str | None = None,
    schema: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a managed table bucketed (and optionally sorted) by the
    join/agg key. Two tables co-bucketed on the same key with the same
    bucket count join with NO shuffle on either side — the planner
    reads the bucket layout from the catalog. At 100 TB this is how a
    repeatedly-joined fact pair amortizes its shuffle: pay it once at
    write time, never at read time.
    """
    writer = (
        df.write.format(TABLE_FORMAT)
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(qualified(table_name, catalog, schema))


def write_split(
    valid: DataFrame,
    invalid: DataFrame,
    table_name: str,
    *,
    catalog: str | None = None,
    schema: str | None = None,
) -> tuple[int, int]:
    """Write a validation split: valid → table, invalid → table_error.

    Counts both sides (for the completion log, reference
    box_ingest.py:176) without caching either:

    - The HOT side (valid ≈ all rows) is counted by ``observe`` riding
      the write job itself — one pass, no persist. At 100 TB a
      ``persist()`` of the valid stream would spill the whole table to
      executor disk just to count it.
    - The cold side (invalid ≈ 0 rows) keeps count-then-write (the
      error table must not be created when there are no errors —
      reference parity); its recompute is one more scan of the input,
      cheaper than materializing a cache.
    """
    from pyspark.sql import Observation

    # isEmpty short-circuits at the first surviving row (cheap on the
    # hot path); only a fully-invalid input pays a real scan, and that
    # case must NOT create the table (reference parity on both sides).
    if valid.isEmpty():
        n_valid = 0
    else:
        obs = Observation()
        observed = valid.observe(obs, F.count(F.lit(1)).alias("n"))
        append_table(observed, table_name, catalog=catalog, schema=schema)
        n_valid = int(obs.get["n"])
    n_invalid = invalid.count()
    if n_invalid:
        append_table(
            invalid, f"{table_name}_error", catalog=catalog, schema=schema
        )
    return n_valid, n_invalid


def append_just_copy(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    *,
    catalog: str | None = None,
    schema: str | None = None,
) -> None:
    """The reference's ``just_copy`` mode (box_ingest.py:161-170):
    stringify every cell, impose the existing target schema minus
    ``process_dt``, append with a fresh ``process_dt``."""
    target = qualified(table_name, catalog, schema)
    target_schema = spark.table(target).schema
    fields = [f for f in target_schema.fields if f.name != "process_dt"]
    stringified = df.select(
        [F.col(c).cast("string").alias(c) for c in df.columns]
    )
    projected = stringified.select(
        [
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in fields
        ]
    )
    append_table(projected, table_name, catalog=catalog, schema=schema)


def write_range_layout(
    df: DataFrame,
    table_name: str,
    *,
    range_col: str,
    n_files: int = 16,
    catalog: str | None = None,
    schema: str | None = None,
) -> None:
    """Write with a range-clustered file layout: rows range-partitioned
    then sorted on ``range_col``, so every parquet file covers a
    disjoint value range. Readers filtering on that column skip whole
    files via row-group min/max stats — the sort-key analog of
    partition pruning, without the directory explosion of
    ``partitionBy`` on a high-cardinality column.
    """
    (
        df.repartitionByRange(n_files, F.col(range_col))
        .sortWithinPartitions(range_col)
        .write.format(TABLE_FORMAT)
        .mode("overwrite")
        .saveAsTable(qualified(table_name, catalog, schema))
    )


def merge_upsert(
    spark: SparkSession,
    source: DataFrame,
    table_name: str,
    keys: list[str],
    *,
    catalog: str | None = None,
    schema: str | None = None,
) -> None:
    """Keyed upsert: source rows replace same-key target rows, others
    insert — re-running an ingest becomes idempotent instead of
    duplicating (the reference can only append).

    Delta available → a real MERGE (file-level rewrite of touched
    files only). Parquet fallback → anti-join keep-set ∪ source,
    lineage cut with ``localCheckpoint`` so the overwrite doesn't read
    the files it is replacing. The fallback rewrites the whole table —
    correct everywhere, economical only below Delta adoption size.
    """
    target = qualified(table_name, catalog, schema)
    if TABLE_FORMAT == "delta":
        from delta.tables import DeltaTable  # type: ignore

        cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        (
            DeltaTable.forName(spark, target)
            .alias("t")
            .merge(source.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    existing = spark.table(target)
    keep = existing.join(source.select(keys).distinct(), keys, "left_anti")
    merged = keep.unionByName(source).localCheckpoint(eager=True)
    merged.write.format(TABLE_FORMAT).mode("overwrite").saveAsTable(target)


AUDIT_TABLE = "box_ingestion_log"
_AUDIT_SCHEMA = "task_owner string, job_action string, log_info string"


@dataclass
class AuditLog:
    """Buffered, injection-safe audit logger.

    ``log()`` is cheap (appends to a list + stdlib logging); ``flush()``
    writes the whole run's rows in ONE table commit. The reference
    issues a parse→plan→Delta-commit per log line via interpolated SQL
    (box_ingest.py:13-20).
    """

    owner: str
    catalog: str | None = None
    schema: str | None = None
    table_name: str = AUDIT_TABLE
    rows: list[tuple[str, str, str]] = field(default_factory=list)

    def log(self, action: str, info: str) -> None:
        self.rows.append((self.owner, action, str(info)))
        import logging

        logging.getLogger(__name__).info(
            "Owner: %s, Action: %s, File Info: %s", self.owner, action, info
        )

    def flush(self, spark: SparkSession) -> int:
        if not self.rows:
            return 0
        df = spark.createDataFrame(self.rows, _AUDIT_SCHEMA)
        append_table(
            df, self.table_name, catalog=self.catalog, schema=self.schema
        )
        n = len(self.rows)
        self.rows.clear()
        return n


def utcnow() -> datetime.datetime:
    return datetime.datetime.now(datetime.timezone.utc)
