"""One-pass column profiler (D39): the schema-level data-quality map a
pipeline consults before touching 100 TB — null rates, cardinality,
ranges, string lengths — as a long-form relation, not a driver report.

Complements D15 (``operators/constraints.py`` validates DECLARED
rules) and D18 (drift compares two profiles): this produces the
profile itself. The output is one row per profiled column:

    column, n_rows, n_nulls, n_distinct,
    min_num, max_num   (numeric columns; ROUND 4)
    min_str, max_str   (string columns; lexicographic)
    avg_len            (string columns; ROUND 4)

Spark shape: ONE aggregation pass computes every metric for every
column simultaneously (a single wide 1-row aggregate), then a
``stack`` projection unpivots to long form — no per-column jobs, no
driver-side loop, no collect. Cardinality defaults to
``approx_count_distinct`` (HLL, one pass, mergeable — the only sane
default at 100 TB); ``exact_distinct=True`` switches to exact
``count_distinct``, which makes Catalyst plan an Expand (one replay of
the stream per distinct aggregate) — affordable on column subsets,
priced in the docstring so nobody turns it on for 200 columns by
accident. The registered query uses the exact path on a 4-column
subset so the DuckDB oracle can reproduce every value bit-for-bit.

The reference infers a schema to export it (/root/reference/main.go
type switch); profiling the DATA under that schema is the engine-side
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

_NUMERIC = (
    ByteType, ShortType, IntegerType, LongType,
    FloatType, DoubleType, DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: every string/numeric/date column)
    in one aggregation pass; see module doc for the output relation.

    Date/timestamp columns profile through the string family (ISO-8601
    casts order correctly and render identically across engines).
    """
    if columns is None:
        columns = [
            f.name
            for f in df.schema.fields
            if isinstance(
                f.dataType,
                _NUMERIC
                + (StringType, DateType, TimestampType, TimestampNTZType),
            )
        ]
    if not columns:
        raise ValueError("profile_table: no profilable columns")
    types = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in columns if c not in types]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")

    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}")
        )
        aggs.append(distinct(c).alias(f"_dist_{c}"))
        if isinstance(types[c], _NUMERIC):
            aggs.append(
                F.round(F.min(F.col(c)).cast("double"), 4).alias(f"_min_{c}")
            )
            aggs.append(
                F.round(F.max(F.col(c)).cast("double"), 4).alias(f"_max_{c}")
            )
        else:
            s = F.col(c).cast("string")
            aggs.append(F.min(s).alias(f"_mins_{c}"))
            aggs.append(F.max(s).alias(f"_maxs_{c}"))
            aggs.append(F.round(F.avg(F.length(s)), 4).alias(f"_len_{c}"))
    wide = df.agg(*aggs)

    # unpivot the 1-row wide aggregate to long form: stack() is a pure
    # projection over one row — no second pass, no collect
    parts = []
    for c in columns:
        if isinstance(types[c], _NUMERIC):
            parts.append(
                f"'{c}', _n, _nulls_{c}, _dist_{c}, "
                f"_min_{c}, _max_{c}, "
                "CAST(NULL AS STRING), CAST(NULL AS STRING), "
                "CAST(NULL AS DOUBLE)"
            )
        else:
            parts.append(
                f"'{c}', _n, _nulls_{c}, _dist_{c}, "
                "CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), "
                f"_mins_{c}, _maxs_{c}, _len_{c}"
            )
    stack = (
        f"stack({len(columns)}, " + ", ".join(parts) + ") AS "
        "(column, n_rows, n_nulls, n_distinct, min_num, max_num, "
        "min_str, max_str, avg_len)"
    )
    return wide.selectExpr(stack)
