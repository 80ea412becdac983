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
column simultaneously (a single wide 1-row aggregate), then an
explode-over-structs projection unpivots to long form — no per-column
jobs, no driver-side loop, no collect, and no SQL-string assembly from
column names (names are data: space/quote/backtick/dot-bearing names
profile fine — everything is renamed positionally first). Cardinality defaults to
``approx_count_distinct`` (HLL, one pass, mergeable — the only sane
default at 100 TB); ``exact_distinct=True`` switches to exact
``count_distinct``, which Catalyst rewrites through an Expand (one
replay of the stream per distinct aggregate) — affordable on column
subsets, priced in the docstring so nobody turns it on for 200
columns by accident. The exact path runs the distincts as a SECOND
aggregate cross-joined back (1 row × 1 row): mixed
distinct+plain aggregation forces every plain metric through the
Expand's multi-key sort-agg rewrite too (r14 measured 2.09 s mixed vs
0.96 s split at sf0.1). The registered query uses the exact path on a
4-column subset so the DuckDB oracle can reproduce every value
bit-for-bit.

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

    # Source column names are data, not syntax: a name with a space,
    # quote, backtick, or dot must neither break parsing nor inject
    # expressions (ADVICE r9). toDF() renames POSITIONALLY — zero name
    # parsing — so every downstream reference and alias is a generated
    # safe identifier; the real name rides along only as a literal.
    pos = {c: df.columns.index(c) for c in columns}
    safe = df.toDF(*[f"_c{i}" for i in range(len(df.columns))])
    src = {c: F.col(f"_c{pos[c]}") for c in columns}
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(columns):
        aggs.append(
            F.sum(src[c].isNull().cast("long")).alias(f"_nulls_{i}")
        )
        if not exact_distinct:
            aggs.append(
                F.approx_count_distinct(src[c]).alias(f"_dist_{i}")
            )
        if isinstance(types[c], _NUMERIC):
            aggs.append(
                F.round(F.min(src[c]).cast("double"), 4).alias(f"_min_{i}")
            )
            aggs.append(
                F.round(F.max(src[c]).cast("double"), 4).alias(f"_max_{i}")
            )
        else:
            s = src[c].cast("string")
            aggs.append(F.min(s).alias(f"_mins_{i}"))
            aggs.append(F.max(s).alias(f"_maxs_{i}"))
            aggs.append(F.round(F.avg(F.length(s)), 4).alias(f"_len_{i}"))
    wide = safe.agg(*aggs)
    if exact_distinct:
        # Exact distincts ride a SEPARATE aggregate cross-joined back
        # (1 row × 1 row, broadcast). Mixing count_distinct with plain
        # min/max/avg in ONE agg forces Catalyst to route EVERY metric
        # through the Expand(n_cols+1 replicas) + multi-key sort-agg
        # rewrite (string min/max buffers bar HashAggregate there) —
        # measured r14 at sf0.1: mixed 2.09 s vs 0.24 s (plain pass) +
        # 0.72 s (distinct-only Expand, pure HashAggregate). The approx
        # path stays one-pass/one-FileScan (HLL is mergeable — no
        # Expand, nothing to split; plan-pinned in
        # tests/test_curation_profile_dp.py::test_profile_is_single_pass).
        wide = wide.crossJoin(
            safe.agg(
                *[
                    F.count_distinct(src[c]).alias(f"_dist_{i}")
                    for i, c in enumerate(columns)
                ]
            )
        )

    # unpivot the 1-row wide aggregate to long form: explode over an
    # array of per-column structs is a pure projection over one row —
    # no second pass, no collect, and (unlike a stack() selectExpr
    # string) no parsing of anything derived from column names
    null_s = F.lit(None).cast("string")
    null_d = F.lit(None).cast("double")
    entries = []
    for i, c in enumerate(columns):
        num = isinstance(types[c], _NUMERIC)
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nulls_{i}").alias("n_nulls"),
                F.col(f"_dist_{i}").alias("n_distinct"),
                (F.col(f"_min_{i}") if num else null_d).alias("min_num"),
                (F.col(f"_max_{i}") if num else null_d).alias("max_num"),
                (null_s if num else F.col(f"_mins_{i}")).alias("min_str"),
                (null_s if num else F.col(f"_maxs_{i}")).alias("max_str"),
                (null_d if num else F.col(f"_len_{i}")).alias("avg_len"),
            )
        )
    return wide.select(
        F.explode(F.array(*entries)).alias("_p")
    ).select("_p.*")
