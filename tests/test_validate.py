"""Golden tests for the validation engine — FIXTURES.md A1 edge cases,
each pinned to the reference semantics (box_ingest.py:85-122)."""

from __future__ import annotations

import datetime

import pytest

from data_ingestion_tool_spark.validate import validate_and_split

METADATA = {
    "Order_ID": "int",
    "Amount": "float",
    "Ship_Date": "date",
    "Created_At": "timestamp",
    "Customer": "string",
    "Region": "int",
    "non_nullable_fields": ["Region"],
}


def _dirty_df(spark):
    rows = [
        # (order_id, amount, ship_date, created_at, customer, region, extra)
        ("1", "10.5", "2026-01-05", "2026-01-05 10:00:00", "alice", "7", "x"),
        ("3.5", "20.0", "2026-01-06", "2026-01-06 11:00:00", "bob", "8", "x"),
        ("2", "abc", "Jan 5 2026", "2026-01-07 12:00:00", "carol", "9", "x"),
        ("4", "1e3", "notadate", "2026-01-08 13:00:00", "dave", "1", "x"),
        ("5", "30.0", "2026-01-09", "2026-01-09T14:00:00", "erin", "2", "x"),
        ("6", "40.0", "2026-01-10", "2026-01-10 15:00:00", None, "3", "x"),
        ("7", "50.0", "2026-01-11", "2026-01-11 16:00:00", "gary", None, "x"),
    ]
    return spark.createDataFrame(
        rows,
        "`  Order_ID ` string, Amount string, Ship_Date string, "
        "Created_At string, Customer string, Region string, extra_col string",
    )


@pytest.fixture(scope="module")
def split(spark):
    valid, invalid = validate_and_split(_dirty_df(spark), METADATA)
    return valid.collect(), invalid.collect(), valid, invalid


def test_conservation(split, spark):
    valid_rows, invalid_rows, *_ = split
    assert len(valid_rows) + len(invalid_rows) == 7


def test_valid_rows_and_coercion(split):
    valid_rows, _, valid_df, _ = split
    by_id = {r["order_id"]: r for r in valid_rows}
    # rows 1 and 6 survive; everything else has exactly one error
    assert set(by_id) == {1, 6}
    r1 = by_id[1]
    assert r1["amount"] == 10.5
    assert r1["ship_date"] == datetime.date(2026, 1, 5)
    assert r1["created_at"] == datetime.datetime(2026, 1, 5, 10, 0, 0)
    assert r1["customer"] == "alice"
    assert r1["region"] == 7
    # nullable null passes through as null (box_ingest.py:98)
    assert by_id[6]["customer"] is None


def test_output_columns_lowercase_and_extra_dropped(split):
    *_, valid_df, _ = split
    assert valid_df.columns == [
        "order_id",
        "amount",
        "ship_date",
        "created_at",
        "customer",
        "region",
    ]
    assert "extra_col" not in valid_df.columns


def test_error_messages(split):
    _, invalid_rows, *_ = split
    errs = {r["error_type"] for r in invalid_rows}
    # int("3.5") raises → type mismatch (box_ingest.py:103-104)
    assert "Type mismatch for column: Order_ID" in errs
    # float("abc") raises (box_ingest.py:105-106)
    assert "Type mismatch for column: Amount" in errs
    # "notadate" fails the lenient parse (box_ingest.py:107-108)
    assert "Type mismatch for column: Ship_Date" in errs
    # ISO 'T' separator fails the STRICT timestamp format
    # (box_ingest.py:109-110)
    assert "Type mismatch for column: Created_At" in errs
    # null in declared non-nullable (box_ingest.py:98-100)
    assert "Null value in non-nullable column: Region" in errs


def test_invalid_record_is_json(split):
    _, invalid_rows, *_ = split
    import json

    rec = json.loads(invalid_rows[0]["record"])
    assert "order_id" in rec  # normalized (stripped+lowercased) names


def test_int_truncation_of_numeric_float(spark):
    """int(3.9) == 3 — numeric floats truncate, toward zero (Python
    int() semantics, box_ingest.py:103-104)."""
    df = spark.createDataFrame([(3.9,), (-3.9,), (None,)], "v double")
    valid, invalid = validate_and_split(df, {"v": "int"})
    got = sorted(
        [r["v"] for r in valid.collect()], key=lambda x: (x is None, x)
    )
    assert got == [-3, 3, None]
    assert invalid.count() == 0


def test_missing_column_flags_every_row(spark):
    df = spark.createDataFrame([("a",), ("b",)], "present string")
    valid, invalid = validate_and_split(
        df, {"present": "string", "Missing_Col": "string"}
    )
    assert valid.count() == 0
    rows = invalid.collect()
    assert len(rows) == 2
    assert all("Missing column: Missing_Col" == r["error_type"] for r in rows)


def test_multiple_errors_joined(spark):
    df = spark.createDataFrame([("x", "y")], "a string, b string")
    valid, invalid = validate_and_split(df, {"a": "int", "b": "float"})
    row = invalid.collect()[0]
    assert (
        row["error_type"]
        == "Type mismatch for column: a; Type mismatch for column: b"
    )


def test_lenient_float_formats(spark):
    df = spark.createDataFrame([("1e3",), ("  2.5 ",)], "v string")
    valid, invalid = validate_and_split(df, {"v": "float"})
    assert sorted(r["v"] for r in valid.collect()) == [2.5, 1000.0]


def test_scale_path_is_expression_only(spark):
    """The plan must contain no Python UDF / RDD stage — validation has
    to stay inside whole-stage codegen to survive 100 TB."""
    df = spark.createDataFrame([("1",)], "v string")
    valid, _ = validate_and_split(df, {"v": "int"})
    plan = valid._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
