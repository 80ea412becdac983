"""Reference-fidelity compatibility layer.

The reference's entire type system is the switch at
/root/reference/main.go:131-148 plus two semantic quirks (SURVEY.md §1.2):

- DECIMAL and DOUBLE both collapse to Parquet DOUBLE (main.go:136-137) —
  DECIMAL loses precision.
- DATE/DATETIME/TIMESTAMP are written as UTF8 strings (main.go:138-140),
  not Parquet temporal logical types.
- Everything outside the switch (FLOAT, SMALLINT, JSON, ENUM, BLOB, ...)
  becomes a dictionary-encoded UTF8 string (main.go:144-147).
- SQL NULL is conflated with "" for string outputs: values scan as
  sql.RawBytes and string(nil) == "" (main.go:183-184), so a Parquet
  null is never written even though fields are OPTIONAL (main.go:150-153).

Our engine preserves real types and real nulls BY DEFAULT; this module
reproduces the reference behavior as an OPT-IN projection for users who
need byte-compatible extracts during migration. It is a plain column
projection — Catalyst folds it into the scan, zero extra passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Formats matching MySQL's textual rendering of temporals, which is what
# the reference's RawBytes scan produces (main.go:117-121, 181-185).
_DATE_FMT = "yyyy-MM-dd"
_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def mysql_native_type(db_type: str) -> T.DataType:
    """NATIVE-mode mapping from a MySQL column type name to the engine's
    Spark type — the lossless counterpart of the reference's switch
    (main.go:131-148), which this deliberately diverges from where the
    reference loses information:

    - DECIMAL keeps DecimalType (reference: lossy DOUBLE, main.go:136).
    - Temporals keep temporal types (reference: UTF8 strings, :138-140).
    - **BIGINT UNSIGNED → DecimalType(20,0)**: the full 0..2⁶⁴-1 domain.
      The reference tags BIGINT as INT64 (:134-135), so unsigned values
      ≥ 2⁶³ overflow — a documented fidelity quirk reproduced only by
      the opt-in ``reference_type_projection`` below. (Spark's own MySQL
      JDBC dialect makes the same Decimal(20,0) choice, so JDBC reads
      and this mapping agree.)
    """
    t = " ".join(db_type.upper().split())
    if t in ("BIGINT UNSIGNED", "UNSIGNED BIGINT"):
        return T.DecimalType(20, 0)
    if t in ("INT UNSIGNED", "UNSIGNED INT", "INTEGER UNSIGNED"):
        return T.LongType()  # 0..2³²-1 fits in int64
    base = t.split("(")[0].split()[0]
    mapping: dict[str, T.DataType] = {
        "TINYINT": T.ByteType(),
        "SMALLINT": T.ShortType(),
        "MEDIUMINT": T.IntegerType(),
        "INT": T.IntegerType(),
        "INTEGER": T.IntegerType(),
        "BIGINT": T.LongType(),
        "DECIMAL": T.DecimalType(38, 18),
        "NUMERIC": T.DecimalType(38, 18),
        "FLOAT": T.FloatType(),
        "DOUBLE": T.DoubleType(),
        "DATE": T.DateType(),
        "DATETIME": T.TimestampNTZType(),  # wall-clock, tz-agnostic
        "TIMESTAMP": T.TimestampType(),    # MySQL TIMESTAMP is UTC-based
        "CHAR": T.StringType(),
        "VARCHAR": T.StringType(),
        "TEXT": T.StringType(),
        "JSON": T.StringType(),
        "ENUM": T.StringType(),
        "SET": T.StringType(),
        "BLOB": T.BinaryType(),
        "VARBINARY": T.BinaryType(),
        "BINARY": T.BinaryType(),
        "BIT": T.LongType(),
    }
    return mapping.get(base, T.StringType())


def reference_type_projection(
    df: DataFrame, *, null_as_empty_string: bool = True
) -> DataFrame:
    """Project ``df`` to the reference's output type system (main.go
    §1.2 mapping). ``null_as_empty_string=True`` also reproduces the
    NULL→"" conflation on string-typed outputs (main.go:183-184);
    numeric columns keep real nulls (the reference delegates that case
    to parquet-go's JSON conversion — undefined — so we keep nulls).
    """
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        dt = f.dataType
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
            # TINYINT/INT → INT32 (main.go:132-133). SMALLINT actually
            # falls to the string default in the reference (:144-147);
            # we treat ShortType per its declared MySQL source below.
            out = c.cast("int")
            is_string = False
        elif isinstance(dt, T.LongType):
            out = c.cast("long")  # BIGINT → INT64 (main.go:134-135)
            is_string = False
        elif isinstance(dt, T.DecimalType) and (dt.precision, dt.scale) == (20, 0):
            # Native unsigned-bigint type (mysql_native_type). The
            # reference tags BIGINT UNSIGNED as INT64 (main.go:134-135),
            # so values ≥ 2⁶³ overflow there; we render those as NULL
            # (try_cast) rather than reproducing the wraparound garbage —
            # documented fidelity divergence, SURVEY.md §1.2.
            out = c.try_cast("long")
            is_string = False
        elif isinstance(dt, T.DecimalType) or isinstance(dt, T.DoubleType):
            out = c.cast("double")  # DECIMAL/DOUBLE → DOUBLE, lossy (:136-137)
            is_string = False
        elif isinstance(dt, T.DateType):
            out = F.date_format(c, _DATE_FMT)  # temporal → UTF8 (:138-140)
            is_string = True
        elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            # NTZ is what our own io layer produces for nanos columns
            # (io.py:_ns_to_ntz); both render MySQL-style without the
            # sub-second fraction (main.go:138-140).
            out = F.date_format(c, _TS_FMT)
            is_string = True
        elif isinstance(dt, T.FloatType):
            # FLOAT is NOT in the switch → default branch → string (:144-147)
            out = c.cast("string")
            is_string = True
        else:
            # CHAR/VARCHAR/TEXT (:141-143) and the default branch
            # (:144-147) both yield UTF8 strings.
            out = c.cast("string")
            is_string = True
        if is_string and null_as_empty_string:
            out = F.coalesce(out, F.lit(""))  # NULL→"" quirk (:183-184)
        cols.append(out.alias(f.name))
    return df.select(*cols)


def export(
    df: DataFrame,
    out_path: str,
    *,
    compat: bool = False,
    single_file: bool = False,
    partition_by: list[str] | None = None,
) -> None:
    """The reference's pipeline tail (main.go:165-203): result set →
    Parquet. ``compat`` applies the type projection; ``single_file``
    reproduces the one-local-file layout AND the naming quirk — the
    reference appends ``.parquet`` to the flag value unconditionally
    (main.go:165, ``fmt.Sprintf("%s.parquet", *fParquet)``), so
    ``--parquet=users.parquet`` yields ``users.parquet.parquet`` there
    and here. Small extracts only; the scale default is a directory of
    part-files at ``out_path`` verbatim, hive-partitioned by
    ``partition_by`` when given (exclusive with ``single_file``)."""
    from mysql2parquet_spark.io import write_parquet

    out = reference_type_projection(df) if compat else df
    if single_file:
        if partition_by:
            raise ValueError("single_file and partition_by are exclusive")
        write_parquet(out, out_path + ".parquet", single_file=True)
    else:
        write_parquet(out, out_path, partition_by=partition_by)
