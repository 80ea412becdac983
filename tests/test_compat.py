"""Unit tests for the reference-compat projection (FIXTURES.md group 2:
one column per branch of /root/reference/main.go:131-153, with NULLs)."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import types as T

from mysql2parquet_spark.compat import reference_type_projection

TYPEZOO_SCHEMA = T.StructType(
    [
        T.StructField("c_tinyint", T.ByteType(), True),
        T.StructField("c_int", T.IntegerType(), True),
        T.StructField("c_bigint", T.LongType(), True),
        T.StructField("c_decimal", T.DecimalType(12, 2), True),
        T.StructField("c_double", T.DoubleType(), True),
        T.StructField("c_date", T.DateType(), True),
        T.StructField("c_datetime", T.TimestampType(), True),
        T.StructField("c_char", T.StringType(), True),
        T.StructField("c_float", T.FloatType(), True),
        T.StructField("c_smallint", T.ShortType(), True),
    ]
)

ROWS = [
    (
        1,
        42,
        2**40,
        Decimal("12345.67"),
        2.5,
        datetime.date(2024, 3, 1),
        datetime.datetime(2024, 3, 1, 12, 30, 45),
        "abc",
        1.5,
        7,
    ),
    (None,) * 10,  # the all-NULL row
]


def _zoo(spark):
    return spark.createDataFrame(ROWS, TYPEZOO_SCHEMA)


def test_type_mapping(spark):
    out = reference_type_projection(_zoo(spark))
    got = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert got == {
        "c_tinyint": "int",      # TINYINT -> INT32 (main.go:132-133)
        "c_int": "int",
        "c_bigint": "bigint",    # BIGINT -> INT64 (main.go:134-135)
        "c_decimal": "double",   # DECIMAL -> DOUBLE, lossy (main.go:136-137)
        "c_double": "double",
        "c_date": "string",      # temporal -> UTF8 (main.go:138-140)
        "c_datetime": "string",
        "c_char": "string",      # CHAR/VARCHAR/TEXT (main.go:141-143)
        "c_float": "string",     # default branch quirk (main.go:144-147)
        "c_smallint": "int",     # engine choice: keep integral (see docstring)
    }


def test_values_and_null_quirk(spark):
    rows = reference_type_projection(_zoo(spark)).collect()
    full, nulls = rows[0], rows[1]
    assert full.c_decimal == 12345.67
    assert full.c_date == "2024-03-01"
    assert full.c_datetime == "2024-03-01 12:30:45"
    assert full.c_float == "1.5"
    # NULL -> "" on string outputs (main.go:183-184)...
    assert nulls.c_date == "" and nulls.c_char == "" and nulls.c_float == ""
    # ...but numeric columns keep real nulls.
    assert nulls.c_int is None and nulls.c_decimal is None


def test_null_preserving_mode(spark):
    rows = reference_type_projection(
        _zoo(spark), null_as_empty_string=False
    ).collect()
    assert rows[1].c_char is None and rows[1].c_date is None
