"""Declarative data-quality constraints — the validation pass a nightly
export pipeline runs before publishing a snapshot.

The reference ships whatever MySQL returns (main.go:106-203 — no checks
between query and parquet). At 100 TB, publishing a corrupt export is
expensive to claw back, so write-audit-publish needs the AUDIT step:
each constraint compiles to a declarative aggregate/join over the
DataFrame (no UDFs, no collect), and ``validate`` unions the per-rule
violation counts into one small report — gate the publish on
``violations == 0``.

Row-local rules (not_null / accepted_values / expression) are single
conditional aggregates (zero shuffle beyond the final fold); unique is
one hash aggregate on the key; referential is one anti-join (broadcast
the parent key-set when it is dimension-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows with a NULL in any named column."""
    cond = None
    for c in cols:
        n = F.col(c).isNull()
        cond = n if cond is None else (cond | n)
    return df.filter(cond)


def unique_violations(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key tuples appearing more than once, with their multiplicity."""
    return (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def accepted_values_violations(
    df: DataFrame, col: str, values: list
) -> DataFrame:
    """Rows whose ``col`` is outside ``values`` (NULL is not a
    membership violation — pair with not_null if required)."""
    return df.filter(~F.col(col).isin(values) & F.col(col).isNotNull())


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    on: list[tuple[str, str]],
    *,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Child rows whose FK tuple has no parent (orphans) — one anti-join
    against the parent KEY-SET (projected + deduplicated, broadcast by
    default: dimension keys are small even when the dimension is wide).
    NULL FKs are not orphans (SQL FK semantics); filter separately."""
    keys = parent.select(
        *[F.col(p).alias(c) for c, p in on]
    ).dropDuplicates([c for c, _ in on])
    if broadcast_parent:
        keys = F.broadcast(keys)
    cond = None
    for c, _ in on:
        notnull = F.col(c).isNotNull()
        cond = notnull if cond is None else (cond & notnull)
    return child.filter(cond).join(keys, on=[c for c, _ in on], how="left_anti")


def validate(
    df: DataFrame, rules: list[dict], *, tables: dict | None = None
) -> DataFrame:
    """Compile a rule list into ONE lazy report DataFrame: a row per
    rule, ``(rule, violations)``, zero means pass (row-local rules
    appear contiguously at the first row-local rule's position).
    Nothing executes until the caller acts on the report; gate a
    snapshot publish on ``report.filter(violations > 0).isEmpty()``.

    Scan economics: all ROW-LOCAL rules (not_null / accepted_values /
    expression) fuse into a SINGLE conditional aggregate — one pass
    over the table no matter how many such rules there are (at 100 TB,
    10 rules = 1 scan, not 10). Only rules that genuinely need their
    own shape scan separately: ``unique`` (hash aggregate on its key)
    and ``referential`` (broadcast anti-join per parent).

    Rule dicts::

        {"type": "not_null", "cols": [...]}
        {"type": "unique", "cols": [...]}
        {"type": "accepted_values", "col": ..., "values": [...]}
        {"type": "expression", "name": ..., "expr": "<SQL boolean>"}
          # violations = rows where the expression is NOT true
        {"type": "referential", "parent": "<tables key>", "on": [(c, p)…]}

    ``tables`` supplies parent DataFrames for referential rules.
    """
    # (name, None, predicate) for fused row-local rules;
    # (name, one_row_df, None) for standalone heavy rules
    compiled: list[tuple] = []
    for r in rules:
        t = r["type"]
        if t == "not_null":
            name = f"not_null({','.join(r['cols'])})"
            pred = None
            for c in r["cols"]:
                n = F.col(c).isNull()
                pred = n if pred is None else (pred | n)
            compiled.append((name, None, pred))
        elif t == "accepted_values":
            name = f"accepted_values({r['col']})"
            pred = ~F.col(r["col"]).isin(r["values"]) & F.col(r["col"]).isNotNull()
            compiled.append((name, None, pred))
        elif t == "expression":
            pred = ~F.coalesce(F.expr(r["expr"]), F.lit(False))
            compiled.append((r["name"], None, pred))
        elif t == "unique":
            name = f"unique({','.join(r['cols'])})"
            agg = unique_violations(df, r["cols"]).agg(
                F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long").alias("violations")
            )
            compiled.append((name, agg, None))
        elif t == "referential":
            name = f"referential({','.join(c for c, _ in r['on'])})"
            if not tables or r["parent"] not in tables:
                raise ValueError(
                    f"referential rule needs parent table {r['parent']!r} "
                    "in tables= — not supplied"
                )
            agg = referential_violations(df, tables[r["parent"]], r["on"]).agg(
                F.count(F.lit(1)).cast("long").alias("violations")
            )
            compiled.append((name, agg, None))
        else:
            raise ValueError(f"unknown rule type: {t!r}")
    if not compiled:
        raise ValueError("validate requires at least one rule")

    # One conditional aggregate covers every row-local rule, then an
    # inline stack() pivots the counts to (rule, violations) rows.
    row_local = [(n, pred) for n, _a, pred in compiled if pred is not None]
    fused = None
    if row_local:
        counts = df.agg(
            *[
                F.coalesce(
                    F.sum(F.when(pred, 1).otherwise(0)), F.lit(0)
                ).cast("long").alias(f"_c{i}")
                for i, (_n, pred) in enumerate(row_local)
            ]
        )
        stack_args = ", ".join(
            # escape backslashes BEFORE quotes: Spark SQL literals
            # honor backslash escapes by default, so a name ending in
            # a backslash would swallow the closing quote
            "'{}', _c{}".format(
                n.replace("\\", "\\\\").replace("'", "\\'"), i
            )
            for i, (n, _p) in enumerate(row_local)
        )
        fused = counts.selectExpr(
            f"stack({len(row_local)}, {stack_args}) AS (rule, violations)"
        )

    parts = []
    fused_done = False
    for name, agg, pred in compiled:
        if pred is not None:
            if not fused_done:
                parts.append(fused)
                fused_done = True
            continue
        parts.append(agg.select(F.lit(name).alias("rule"), "violations"))
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out
