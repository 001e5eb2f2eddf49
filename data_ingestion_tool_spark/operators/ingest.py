"""The ingestion-validation engine as a registry query: the
reference's core hand-rolled operator (box_ingest.py:85-122), measured
and oracle-checked like every other operator.

The reference validates with a CPython ``iterrows()`` loop on one
driver core (~10⁴-10⁵ rows/s analytic bound, BASELINE.md). Here the
same metadata contract compiles to try_cast/when Column expressions —
whole-stage codegen over all partitions — so the bench entry directly
substantiates the throughput claim at sf0.1 (600k rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_tool_spark.operators.base import QuerySpec
from data_ingestion_tool_spark.sources.tables import load_table
from data_ingestion_tool_spark.validate import validate_and_split

#: metadata contract exercised against stringified lineitem columns —
#: int truncation, float laxity, stringify-never-fails, non-nullable.
_METADATA = {
    "L_Orderkey": "int",
    "l_quantity": "float",
    "L_EXTENDEDPRICE": "float",
    "l_returnflag": "string",
    "non_nullable_fields": ["l_orderkey"],
}


def validate_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stringify a 4-column slice of lineitem (simulating a parsed
    text file), run the compiled validation, return the valid side.

    Clean input ⇒ the oracle is the equivalent cast pipeline; the
    dirty-input branches are pinned by the golden tests
    (tests/test_validate.py, FIXTURES.md A1).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("string").alias("L_Orderkey "),
        F.col("l_quantity").cast("string").alias("l_quantity"),
        F.col("l_extendedprice").cast("string").alias("L_EXTENDEDPRICE"),
        F.col("l_returnflag").alias("l_returnflag"),
    )
    valid, _invalid = validate_and_split(li, _METADATA)
    return valid


VALIDATE_LINEITEM_SQL = """
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(l_quantity AS DOUBLE) AS l_quantity,
       CAST(l_extendedprice AS DOUBLE) AS l_extendedprice,
       CAST(l_returnflag AS VARCHAR) AS l_returnflag
FROM lineitem
"""


SPECS: list[QuerySpec] = [
    QuerySpec("validate_lineitem", validate_lineitem, VALIDATE_LINEITEM_SQL,
              "metadata-compiled validation (the reference's row loop, "
              "vectorized)", ("ingest", "flagship")),
]
