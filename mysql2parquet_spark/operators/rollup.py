"""Incremental aggregate maintenance — update a persisted rollup from a
keyed snapshot diff instead of recomputing it.

The reference's consumers rebuild every downstream aggregate from each
nightly full export (/root/reference/main.go:87-165 re-exports the whole
table; anything derived recomputes). At 100 TB that is a full scan per
rollup per night. With versioned snapshots the changed rows are knowable
(``io.snapshot_diff(include_old=True)``), and sum/count-style aggregates
are ABELIAN — every row's contribution can be added and subtracted
independently:

- I rows add their new contribution,
- D rows subtract their old contribution,
- U rows do both — which also handles a row MOVING between groups
  (the old contribution leaves the old group, the new one enters the
  new group).

So the update cost is proportional to the CHANGED rows, not the table:
aggregate the diff (one shuffle of delta-sized data), then one keyed
full-outer merge into the old rollup. The rollup side's shuffle
disappears entirely if the rollup is stored bucketed on its group
columns (``io.write_bucketed``). AVG/stddev follow by carrying (sum,
count[, sum-of-squares]); order statistics (MIN/MAX/percentiles) are
NOT abelian — deletes can expose a new extremum only a re-scan of the
group can find — and are refused rather than silently wrong.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_snapshot(
    snapshot: DataFrame, group_cols: list[str], sum_cols: dict[str, str]
) -> DataFrame:
    """The batch face: the rollup shape ``incremental_agg_update``
    maintains — ``group_cols…, cnt, <out>…`` with one SUM per
    ``sum_cols`` entry {out_name: source_col}. Run once to bootstrap;
    afterwards maintain incrementally."""
    return snapshot.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("cnt"),
        *[F.sum(src).alias(out) for out, src in sum_cols.items()],
    )


def incremental_agg_update(
    agg_old: DataFrame,
    diff: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str],
) -> DataFrame:
    """Fold a ``snapshot_diff(..., include_old=True)`` batch into a
    rollup produced by ``aggregate_snapshot`` (or a previous call of
    this). Returns the updated rollup; groups whose count reaches zero
    disappear, exactly as a recompute would drop them.

    Cost shape: two delta-sized projections + one hash aggregate over
    2×(changed rows), then one full-outer join with the old rollup on
    the group columns. ``diff`` is referenced twice (add side and
    subtract side) — MATERIALIZE it first (write the delta-sized batch
    to parquet, as the nightly loop naturally does) or the lazy diff
    plan re-runs its snapshot join per side. Equivalence with a full
    recompute is pinned in tests, including group-moving updates and
    group birth/death.
    """
    if not group_cols:
        raise ValueError("incremental_agg_update requires group columns")
    reserved = {"cnt", *sum_cols}
    clash = reserved & set(group_cols)
    if clash:
        raise ValueError(f"group/aggregate name clash: {sorted(clash)}")
    for c in group_cols:
        if f"old_{c}" not in diff.columns:
            raise ValueError(
                f"diff lacks old_{c} — produce it with "
                "snapshot_diff(..., include_old=True)"
            )

    # new-side contributions of I and U rows
    adds = diff.filter(F.col("change").isin("I", "U")).select(
        *[F.col(c) for c in group_cols],
        F.lit(1).alias("_w"),
        *[F.col(src).alias(out) for out, src in sum_cols.items()],
    )
    # old-side contributions of D and U rows, negated (old_* columns —
    # a U row that moved groups leaves its OLD group here)
    subs = diff.filter(F.col("change").isin("D", "U")).select(
        *[F.col(f"old_{c}").alias(c) for c in group_cols],
        F.lit(-1).alias("_w"),
        *[(-F.col(f"old_{src}")).alias(out) for out, src in sum_cols.items()],
    )
    delta = (
        adds.unionByName(subs)
        .groupBy(*group_cols)
        .agg(
            F.sum("_w").alias("_dcnt"),
            *[F.sum(out).alias(f"_d_{out}") for out in sum_cols],
        )
    )
    merged = agg_old.join(delta, on=group_cols, how="full_outer")
    out_cols = [
        *group_cols,
        (
            F.coalesce(F.col("cnt"), F.lit(0))
            + F.coalesce(F.col("_dcnt"), F.lit(0))
        ).alias("cnt"),
        *[
            (
                F.coalesce(F.col(out), F.lit(0))
                + F.coalesce(F.col(f"_d_{out}"), F.lit(0))
            ).alias(out)
            for out in sum_cols
        ],
    ]
    return merged.select(*out_cols).filter(F.col("cnt") > 0)
