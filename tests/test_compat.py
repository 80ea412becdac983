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


def test_mysql_native_type_mapping():
    from mysql2parquet_spark.compat import mysql_native_type

    assert mysql_native_type("BIGINT UNSIGNED") == T.DecimalType(20, 0)
    assert mysql_native_type("bigint unsigned") == T.DecimalType(20, 0)
    assert mysql_native_type("INT UNSIGNED") == T.LongType()
    assert mysql_native_type("BIGINT") == T.LongType()
    assert mysql_native_type("VARCHAR(255)") == T.StringType()
    assert mysql_native_type("DATETIME") == T.TimestampNTZType()
    assert mysql_native_type("TIMESTAMP") == T.TimestampType()
    assert mysql_native_type("GEOMETRY") == T.StringType()  # default branch


def test_unsigned_bigint_compat_overflow(spark):
    """Native Decimal(20,0) holds the full unsigned range; the compat
    projection reproduces the reference's INT64 tag (main.go:134-135)
    with ≥2⁶³ values nulled instead of wrapped (documented divergence)."""
    df = spark.createDataFrame(
        [(Decimal(2**63 - 1),), (Decimal(2**63),), (Decimal(2**64 - 1),), (None,)],
        T.StructType([T.StructField("c_ubig", T.DecimalType(20, 0), True)]),
    )
    out = reference_type_projection(df, null_as_empty_string=False)
    assert out.schema["c_ubig"].dataType == T.LongType()
    vals = [r.c_ubig for r in out.collect()]
    assert vals[0] == 2**63 - 1
    assert vals[1] is None and vals[2] is None  # overflow -> NULL, not wrap
    assert vals[3] is None


def test_ntz_timestamp_compat_rendering(spark):
    """TimestampNTZ (what io.py produces for nanos columns) must render
    MySQL-style without sub-second fractions, same as TimestampType."""
    import datetime

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 3, 1, 10, 0, 0, 123456),)],
        T.StructType([T.StructField("ts", T.TimestampNTZType(), True)]),
    )
    out = reference_type_projection(df)
    assert out.collect()[0].ts == "2024-03-01 10:00:00"
