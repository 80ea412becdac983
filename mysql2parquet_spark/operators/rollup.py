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
group can find. They are refused unless the caller supplies the new
snapshot, in which case ONLY the affected groups are re-aggregated
from it (delta-keyed semi-join) and untouched groups pass through —
cost proportional to the changed groups, never the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_MINMAX_OPS = {"min": F.min, "max": F.max}


def _nullsafe_keys(left: DataFrame, right: DataFrame, cols: list[str]):
    """Null-safe (<=>) equi-join condition on ``cols`` — still a hash
    join, but NULL group keys match each other as groupBy semantics
    require."""
    cond = None
    for c in cols:
        e = left[c].eqNullSafe(right[c])
        cond = e if cond is None else (cond & e)
    return cond


def _agg_exprs(
    sum_cols: dict[str, str], minmax_cols: dict[str, tuple[str, str]] | None
) -> list:
    exprs = [F.count(F.lit(1)).alias("cnt")]
    exprs += [F.sum(src).alias(out) for out, src in sum_cols.items()]
    # companion NON-NULL contributor count per SUM: the fold needs it to
    # distinguish "sum is 0" from "sum is NULL" (see incremental_agg_update
    # — subtracting a group's last non-null value must leave NULL when
    # only NULL-valued rows remain, exactly like a recompute)
    exprs += [F.count(src).alias(f"nn_{out}") for out, src in sum_cols.items()]
    for out, (op, src) in (minmax_cols or {}).items():
        if op not in _MINMAX_OPS:
            raise ValueError(f"minmax_cols op must be min/max, got {op!r}")
        exprs.append(_MINMAX_OPS[op](src).alias(out))
    return exprs


def aggregate_snapshot(
    snapshot: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str],
    minmax_cols: dict[str, tuple[str, str]] | None = None,
) -> DataFrame:
    """The batch face: the rollup shape ``incremental_agg_update``
    maintains — ``group_cols…, cnt, <out>…, nn_<out>…`` with one SUM
    plus its non-null contributor count per ``sum_cols`` entry
    {out_name: source_col} and (optionally) one MIN/MAX per
    ``minmax_cols`` entry {out_name: (op, source_col)}. The ``nn_``
    companions are part of the persisted shape on purpose: without
    them a fold cannot distinguish a zero SUM from a NULL one when a
    group's last non-null value is deleted. Run once to bootstrap;
    afterwards maintain incrementally."""
    return snapshot.groupBy(*group_cols).agg(
        *_agg_exprs(sum_cols, minmax_cols)
    )


def incremental_agg_update(
    agg_old: DataFrame,
    diff: DataFrame,
    group_cols: list[str],
    sum_cols: dict[str, str],
    minmax_cols: dict[str, tuple[str, str]] | None = None,
    snapshot_new: DataFrame | None = None,
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

    MIN/MAX (``minmax_cols`` = {out: ("min"|"max", src)}) are NOT
    abelian — a delete can expose an extremum only a re-scan can find —
    so they are refused unless ``snapshot_new`` (the post-diff table)
    is supplied. With it, the AFFECTED groups (any group key a diff row
    enters or leaves) are re-aggregated from ``snapshot_new`` via a
    delta-keyed semi-join — cost proportional to changed groups'
    rows, not the table (bucketed/clustered layouts prune the scan
    further) — and untouched groups pass through from ``agg_old``
    via an anti-join, no abelian arithmetic needed for either side.
    """
    if not group_cols:
        raise ValueError("incremental_agg_update requires group columns")
    reserved = {
        "cnt",
        *sum_cols,
        *(f"nn_{out}" for out in sum_cols),
        *(minmax_cols or {}),
    }
    clash = reserved & set(group_cols)
    if clash:
        raise ValueError(f"group/aggregate name clash: {sorted(clash)}")
    for c in group_cols:
        if f"old_{c}" not in diff.columns:
            raise ValueError(
                f"diff lacks old_{c} — produce it with "
                "snapshot_diff(..., include_old=True)"
            )
    for out in sum_cols:
        if f"nn_{out}" not in agg_old.columns:
            raise ValueError(
                f"agg_old lacks nn_{out} (the non-null contributor count "
                "aggregate_snapshot maintains alongside each SUM — without "
                "it a fold cannot tell a zero sum from a NULL one); "
                "re-bootstrap the rollup with aggregate_snapshot"
            )

    if minmax_cols:
        if snapshot_new is None:
            raise ValueError(
                "MIN/MAX aggregates are not incrementally maintainable "
                "(a delete can expose a new extremum); pass snapshot_new "
                "for affected-group re-aggregation, or recompute"
            )
        # every group key the diff touches, on either side of a move
        affected = (
            diff.filter(F.col("change").isin("I", "U"))
            .select(*group_cols)
            .unionByName(
                diff.filter(F.col("change").isin("D", "U")).select(
                    *[F.col(f"old_{c}").alias(c) for c in group_cols]
                )
            )
            .distinct()
        )
        # null-safe key equality: NULL is a legitimate group and must
        # still route to the re-aggregation side when touched
        untouched = agg_old.join(
            affected, on=_nullsafe_keys(agg_old, affected, group_cols),
            how="left_anti",
        )
        recomputed = aggregate_snapshot(
            snapshot_new.join(
                affected,
                on=_nullsafe_keys(snapshot_new, affected, group_cols),
                how="left_semi",
            ),
            group_cols,
            sum_cols,
            minmax_cols,
        )
        return untouched.unionByName(recomputed)

    # new-side contributions of I and U rows (the _nn indicator tracks
    # NON-NULL contributions so the fold can restore a NULL sum when a
    # group's last non-null value leaves)
    adds = diff.filter(F.col("change").isin("I", "U")).select(
        *[F.col(c) for c in group_cols],
        F.lit(1).alias("_w"),
        *[F.col(src).alias(out) for out, src in sum_cols.items()],
        *[
            F.col(src).isNotNull().cast("long").alias(f"_nn_{out}")
            for out, src in sum_cols.items()
        ],
    )
    # old-side contributions of D and U rows, negated (old_* columns —
    # a U row that moved groups leaves its OLD group here)
    subs = diff.filter(F.col("change").isin("D", "U")).select(
        *[F.col(f"old_{c}").alias(c) for c in group_cols],
        F.lit(-1).alias("_w"),
        *[(-F.col(f"old_{src}")).alias(out) for out, src in sum_cols.items()],
        *[
            (-F.col(f"old_{src}").isNotNull().cast("long")).alias(f"_nn_{out}")
            for out, src in sum_cols.items()
        ],
    )
    delta = (
        adds.unionByName(subs)
        .groupBy(*group_cols)
        .agg(
            F.sum("_w").alias("_dcnt"),
            *[F.sum(out).alias(f"_d_{out}") for out in sum_cols],
            *[F.sum(f"_nn_{out}").alias(f"_dnn_{out}") for out in sum_cols],
        )
    )
    # Name-based USING join: plain equi-keys keep a bucketed rollup's
    # Exchange elimination intact (null-safe <=> keys are rewritten to
    # coalesce/isnull pairs that no longer match the bucket
    # partitioning). A NULL group key therefore doesn't MATCH across
    # the join — it splits into (at most) one old-side and one
    # delta-side row — and the nullable-key path below re-merges the
    # split with a post-join aggregate that rides the join's existing
    # hash partitioning (no extra Exchange).
    merged = agg_old.join(delta, on=group_cols, how="full_outer")
    nn_new = {
        out: (
            F.coalesce(F.col(f"nn_{out}"), F.lit(0))
            + F.coalesce(F.col(f"_dnn_{out}"), F.lit(0))
        )
        for out in sum_cols
    }
    # RAW per-row fold first — the NULL-vs-0 decision must wait until
    # the group's state is final (after the nullable-key re-merge): a
    # split delta-side row can carry a real value delta (-25) with a
    # net-zero nn delta, and gating per-row would erase it
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
        *[nn_new[out].alias(f"nn_{out}") for out in sum_cols],
    ]
    sel = merged.select(*out_cols)
    keys_nullable = any(
        f.nullable
        for df in (agg_old, diff)
        for f in df.schema
        if f.name in group_cols
    )
    if keys_nullable:
        # SUM re-merge of the split NULL-key rows (identity for every
        # non-NULL group: exactly one row). Cast back to the rollup's
        # own types so decimal sums don't silently widen across nightly
        # folds.
        types = dict(sel.dtypes)
        sel = sel.groupBy(*group_cols).agg(
            F.sum("cnt").cast(types["cnt"]).alias("cnt"),
            *[F.sum(out).cast(types[out]).alias(out) for out in sum_cols],
            *[
                F.sum(f"nn_{out}").cast(types[f"nn_{out}"]).alias(f"nn_{out}")
                for out in sum_cols
            ],
        )
    # final state: zero NON-NULL contributors => the group's SUM is
    # genuinely NULL (a recompute over its all-NULL survivors says
    # NULL). This covers both the never-had-values case and the
    # last-non-null-value-deleted transition, which a plain
    # both-sides-NULL test misses (the subtract side is non-NULL there).
    sel = sel.select(
        *group_cols,
        "cnt",
        *[
            F.when(F.col(f"nn_{out}") == 0, F.lit(None))
            .otherwise(F.col(out))
            .alias(out)
            for out in sum_cols
        ],
        *[F.col(f"nn_{out}") for out in sum_cols],
    )
    return sel.filter(F.col("cnt") > 0)
