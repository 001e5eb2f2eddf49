"""Custom Python DataSource (Spark ≥4.0 ``pyspark.sql.datasource``):
``spark.read.format("xlsx")`` backed by the vendored stdlib workbook
parser (``xlsx_lite``) — no openpyxl, no driver-side loop.

Why a DataSource and not the existing ``binaryFile``+``mapInPandas``
reader (``sources/excel.py``): the DataSource API gives the catalog a
real format name, schema inference at plan time, and per-file
InputPartitions, so a directory of workbooks scans with one task per
file and the usual source contract (``.load``, ``.schema``,
``.option``). The reference reads workbooks one at a time on the
driver via ``pd.read_excel`` (box_ingest.py:152-156); here parsing
runs ON EXECUTORS, one partition per workbook.

Scale notes: schema comes from the first file only (driver parses one
workbook — bounded); each executor task parses exactly one workbook.
Workbooks are inherently single-blob (a zip archive can't be split),
so per-file partitioning is the maximum parallelism the format allows.
File listing uses the local/posix glob — on a cluster filesystem the
listing would go through the Hadoop FS API; the partition/read
contract is unchanged.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from data_ingestion_tool_spark.xlsx_lite import parse_xlsx


class XlsxFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _matched_paths(options: dict) -> list[str]:
    path = options.get("path")
    if not path:
        raise ValueError("xlsx source requires a path: .load('<dir-or-file>')")
    if os.path.isdir(path):
        pattern = os.path.join(path, "*.xls[xm]")
    else:
        pattern = path
    paths = sorted(glob.glob(pattern))
    if not paths:
        raise FileNotFoundError(f"no workbooks match {pattern!r}")
    return paths


def _parse_one(path: str, options: dict):
    skip = options.get("skip_rows")
    return parse_xlsx(
        open(path, "rb").read(),
        sheet_name=options.get("sheet_name"),
        skip_rows=int(skip) if skip is not None else None,
    )


_SPARK_TYPES = {"int64": "bigint", "float64": "double", "bool": "boolean"}


class XlsxReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options

    def partitions(self) -> Sequence[InputPartition]:
        return [XlsxFilePartition(p) for p in _matched_paths(self.options)]

    def read(self, partition: XlsxFilePartition) -> Iterator[tuple]:
        import pandas as pd

        pdf = _parse_one(partition.path, self.options)
        for row in pdf.itertuples(index=False):
            yield tuple(None if pd.isna(v) else v for v in row)


class XlsxDataSource(DataSource):
    """``spark.dataSource.register(XlsxDataSource)`` then
    ``spark.read.format("xlsx").option("sheet_name", "S").load(dir)``."""

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self) -> str:
        pdf = _parse_one(_matched_paths(self.options)[0], self.options)
        cols = ", ".join(
            f"`{c}` {_SPARK_TYPES.get(str(t), 'string')}"
            for c, t in zip(pdf.columns, pdf.dtypes)
        )
        return cols or "`empty` string"

    def reader(self, schema) -> XlsxReader:
        return XlsxReader(self.options)


def register_xlsx_source(spark) -> None:
    spark.dataSource.register(XlsxDataSource)
