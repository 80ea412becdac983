"""Join-based MERGE / upsert — the incremental-export half of the
reference's job.

The reference (/root/reference/main.go:87-165) does one-shot full
exports: every run re-reads the whole MySQL table and rewrites the whole
parquet file. At 100 TB that is not a plan — the natural extension is
snapshot + periodic delta batches folded in with MERGE semantics, which
plain Spark SQL lacks (no MERGE INTO without a table format). This
module owns that operator as a join composition:

- ``merge_upsert``: rows in ``source`` replace key-matching rows in
  ``target``; unmatched target rows survive; unmatched source rows are
  inserts. ``MERGE ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
  THEN INSERT *`` — including the standard-SQL error on multiple source
  rows per key (strict mode), or last-event-wins when an ordering
  column is supplied.
- ``compact_cdc_batch`` + ``apply_cdc``: resolve a raw CDC event batch
  (insert/update/delete events with a sequence column) to the FINAL
  event per key before merging, so delete-then-reinsert within one
  batch lands as the reinsert, not the delete.
- optional ``deletes``: a key-set dropped from the result (CDC
  tombstones), applied after the upsert. The batch must already be
  compacted to one final event per key (``compact_cdc_batch`` does
  this); a key present in both ``source`` and ``deletes`` ends up
  deleted.
- ``scd2_history`` + ``scd2_asof``: Slowly-Changing-Dimension Type 2 —
  fold the FULL event log into a versioned history table (one row per
  key-version with ``effective_from``/``effective_to``/``is_current``)
  instead of collapsing to the latest state, then look any past state
  back up with a point-in-time filter. This is the warehouse-dimension
  counterpart of the nightly exporter: the reference's consumers diff
  successive full exports to reconstruct history; SCD2 keeps it.
  ``scd2_apply_batch`` maintains that history incrementally — one CDC
  batch folded in at delta-shaped cost (closed versions are immutable;
  only touched keys' open tails re-fold).

Scale shape: one shuffle per side on the merge keys (the left-anti
join), union is shuffle-free. When the delta batch is small relative to
the snapshot — the normal CDC case — pass ``broadcast_source=True`` and
the whole merge is a single scan of the target with zero target-side
shuffle: broadcast-anti-join + union. Large deltas (backfill, initial
load) must NOT broadcast: ``snapshot_merge(broadcast_source=False)``
falls back to a shuffled anti-join instead of blowing the 8 GB
broadcast limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dedupe_source(source: DataFrame, keys: list[str], order_col: str | None) -> DataFrame:
    """One row per key: last-event-wins by ``order_col`` desc, or a
    runtime assert that keys are already unique (strict MERGE, which
    errors on multiple source matches). The assert is evaluated
    executor-side inside the plan — no extra driver job, no collect."""
    if order_col is not None:
        if order_col not in source.columns:
            raise ValueError(f"order_col {order_col!r} not in source columns")
        w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        return (
            source.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    w = Window.partitionBy(*keys)
    guard = F.assert_true(
        F.count(F.lit(1)).over(w) == 1,
        F.concat(
            F.lit("merge_upsert: multiple source rows for key ("),
            F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
            F.lit(") — pass order_col for last-event-wins, or pre-compact"),
        ),
    )
    # assert_true yields NULL when the predicate holds; filtering on it
    # keeps the expression alive through optimization.
    return source.withColumn("_dup_guard", guard).filter(F.col("_dup_guard").isNull()).drop("_dup_guard")


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    deletes: DataFrame | None = None,
    broadcast_source: bool = False,
    order_col: str | None = None,
    source_unique: bool = False,
) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``keys``; optionally drop
    ``deletes`` keys. Schemas must agree by name (unionByName).

    Duplicate source keys: with ``order_col`` the highest value wins
    (binlog sequence / commit timestamp; ties are ambiguous — use a
    total order). Without it the merge ERRORS at runtime on duplicate
    keys, like standard MERGE INTO. ``source_unique=True`` skips the
    check (and its window exchange) when the caller guarantees
    uniqueness, e.g. output of ``compact_cdc_batch``.

    ``broadcast_source=True`` broadcasts the source key-set into the
    anti-join (and the delete key-set too) — use whenever the delta is
    small enough to broadcast; the target is then never shuffled.
    """
    if not keys:
        raise ValueError("merge_upsert requires at least one key column")
    missing = [k for k in keys if k not in target.columns or k not in source.columns]
    if missing:
        raise ValueError(f"merge keys missing from target/source: {missing}")

    src = source if source_unique else _dedupe_source(source, keys, order_col)
    # Key set from the RAW source: per-key dedupe doesn't change which
    # keys exist, and deriving keys from `src` would duplicate the
    # window/guard subtree into the anti-join side — two delta shuffles
    # instead of one.
    src_keys = source.select(*keys).dropDuplicates(keys)
    if broadcast_source:
        src_keys = F.broadcast(src_keys)
    kept = target.join(src_keys, on=keys, how="left_anti")
    out = src.unionByName(kept)
    if deletes is not None:
        del_keys = deletes.select(*keys).dropDuplicates(keys)
        if broadcast_source:
            del_keys = F.broadcast(del_keys)
        out = out.join(del_keys, on=keys, how="left_anti")
    return out


def compact_cdc_batch(
    events: DataFrame,
    keys: list[str],
    *,
    op_col: str = "op",
    seq_col: str = "seq",
    delete_op: str = "D",
) -> tuple[DataFrame, DataFrame]:
    """Resolve a raw CDC batch to its net effect: ``(upserts, deletes)``.

    Keeps only the LAST event per key (highest ``seq_col`` — binlog
    position / LSN; must totally order events within a key). A key whose
    final event is a delete lands in ``deletes`` (keys only); otherwise
    its final row lands in ``upserts`` with ``op_col``/``seq_col``
    dropped, ready for ``merge_upsert(source_unique=True)``. One window
    shuffle on the keys — over the delta batch, never the snapshot.
    """
    for c in (op_col, seq_col):
        if c not in events.columns:
            raise ValueError(f"compact_cdc_batch: column {c!r} not in events")
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    last = (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # A NULL op on the FINAL event of a key would land in NEITHER branch
    # below (both != and == filters are NULL for it) and the key's change
    # would silently drop — fail the job instead, executor-side. Guarding
    # AFTER compaction on purpose: a NULL-op event superseded by a later
    # event is harmless and must not abort the batch. The check lives
    # INSIDE the op column (when/otherwise raise_error), not a separate
    # guard filter: Catalyst pushes the op!=/op== branch filters below
    # any standalone guard, silently dropping the NULL row before the
    # assert ever evaluates — embedded in the column, evaluating either
    # branch's predicate forces the check.
    checked_op = F.when(F.col(op_col).isNotNull(), F.col(op_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("compact_cdc_batch: NULL op is the final event for key ("),
                F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
                F.lit(")"),
            )
        )
    )
    last = last.withColumn(op_col, checked_op)
    upserts = last.filter(F.col(op_col) != delete_op).drop(op_col, seq_col)
    deletes = last.filter(F.col(op_col) == delete_op).select(*keys)
    return upserts, deletes


def apply_cdc(
    target: DataFrame,
    events: DataFrame,
    keys: list[str],
    *,
    op_col: str = "op",
    seq_col: str = "seq",
    delete_op: str = "D",
    broadcast_source: bool = True,
) -> DataFrame:
    """Fold one raw CDC event batch into ``target``: compact to the
    final event per key, then broadcast-anti merge. Delete-then-reinsert
    within the batch correctly survives as the reinsert."""
    upserts, deletes = compact_cdc_batch(
        events, keys, op_col=op_col, seq_col=seq_col, delete_op=delete_op
    )
    return merge_upsert(
        target,
        upserts,
        keys,
        deletes=deletes,
        broadcast_source=broadcast_source,
        source_unique=True,
    )


def snapshot_apply_cdc(
    spark,
    snapshot_path: str,
    events: DataFrame,
    keys: list[str],
    *,
    op_col: str = "op",
    seq_col: str = "seq",
    delete_op: str = "D",
    broadcast_source: bool = True,
) -> DataFrame:
    """``apply_cdc`` against a parquet snapshot path — the CDC face of
    ``snapshot_merge``, owning the read-through-``io.read_parquet``
    invariant (ns-timestamp normalization; see snapshot_merge) in ONE
    place for both the CLI and library callers."""
    from mysql2parquet_spark.io import read_parquet

    return apply_cdc(
        read_parquet(spark, snapshot_path),
        events,
        keys,
        op_col=op_col,
        seq_col=seq_col,
        delete_op=delete_op,
        broadcast_source=broadcast_source,
    )


def snapshot_merge(
    spark,
    snapshot_path: str,
    delta: DataFrame,
    keys: list[str],
    *,
    deletes: DataFrame | None = None,
    broadcast_source: bool = True,
    order_col: str | None = None,
) -> DataFrame:
    """Read the current parquet snapshot, fold one delta batch in. The
    caller writes the result to the next snapshot path (write-audit-
    publish: never overwrite the snapshot being read).

    ``broadcast_source`` defaults to True (normal CDC: small delta vs
    big snapshot → zero snapshot-side shuffle); set False for large
    deltas (backfill / initial load) that would exceed the broadcast
    limit or OOM the driver.

    The snapshot reads through ``io.read_parquet`` (not a bare
    spark.read) so ns-timestamp columns normalize the same way as every
    other read — a raw read would give the target ts:bigint while the
    delta has ts:timestamp and unionByName would fail.
    """
    from mysql2parquet_spark.io import read_parquet

    return merge_upsert(
        read_parquet(spark, snapshot_path),
        delta,
        keys,
        deletes=deletes,
        broadcast_source=broadcast_source,
        order_col=order_col,
    )


def scd2_history(
    events: DataFrame,
    keys: list[str],
    *,
    seq_col: str = "seq",
    op_col: str | None = None,
    delete_op: str = "D",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Fold a CDC event log into an SCD Type 2 history table.

    Every non-delete event opens one version of its key, effective from
    its own ``seq_col`` value until the NEXT event of that key (any op —
    an update supersedes, a delete terminates); the last open version has
    ``effective_to`` NULL and ``is_current`` 1. Delete events emit no row
    themselves — they only close the preceding interval (and because the
    lead is computed BEFORE the delete rows are dropped, a key whose
    final event is a delete correctly has no current version).

    ``(keys, seq_col, *tiebreak_cols)`` must totally order events within
    a key — an executor-side assert fails the job on a duplicate rather
    than emitting an ambiguous interval chain (same contract style as
    strict ``merge_upsert``). Pass the binlog file/position pair or an
    event id as the tiebreak when timestamps alone can collide.

    Scale shape: ONE shuffle of the event log on ``keys`` (the window),
    then pure projection/filter — no join against the history, no
    iteration, no driver materialization. Rebuilding history at 100 TB
    is a single pass; incremental maintenance appends new events and
    re-folds only affected keys upstream of this operator.
    """
    if not keys:
        raise ValueError("scd2_history requires at least one key column")
    ties = tiebreak_cols or []
    for c in [seq_col, *ties, *([op_col] if op_col else [])]:
        if c not in events.columns:
            raise ValueError(f"scd2_history: column {c!r} not in events")
    order = [F.col(seq_col).asc(), *[F.col(c).asc() for c in ties]]
    w = Window.partitionBy(*keys).orderBy(*order)
    # Duplicate-ordering detection rides the SAME window spec as the
    # lead: duplicates are ADJACENT in the (keys, seq, ties) sort, so
    # lag() finds them without the second (keys, seq, ties)-partitioned
    # exchange a count-per-tuple window would cost — the fold stays one
    # shuffle. Null-safe equality so the first row per key (NULL lags)
    # always passes.
    dup = F.lag(F.col(seq_col)).over(w).eqNullSafe(F.col(seq_col))
    for c in ties:
        dup = dup & F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
    guard = F.assert_true(
        ~dup,
        F.concat(
            F.lit("scd2_history: duplicate event ordering for key ("),
            F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
            F.lit(") at "),
            F.col(seq_col).cast("string"),
            F.lit(" — add tiebreak_cols for a total order"),
        ),
    )
    out = (
        events.withColumn("effective_from", F.col(seq_col))
        .withColumn("effective_to", F.lead(seq_col).over(w))
        .withColumn("_ord_guard", guard)
        .filter(F.col("_ord_guard").isNull())
        .drop("_ord_guard")
        .withColumn(
            "is_current", F.col("effective_to").isNull().cast("int")
        )
    )
    if op_col is not None:
        # A NULL op would satisfy neither != nor == and silently vanish
        # from the history (leaving an interval hole) — same failure
        # class compact_cdc_batch guards against; embed the check in
        # the column so Catalyst can't push the filter below it.
        checked = F.when(F.col(op_col).isNotNull(), F.col(op_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("scd2_history: NULL op for key ("),
                    F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
                    F.lit(") at "),
                    F.col(seq_col).cast("string"),
                )
            )
        )
        out = out.withColumn(op_col, checked)
        out = out.filter(F.col(op_col) != delete_op).drop(op_col)
    return out


def scd2_asof(history: DataFrame, as_of, *, seq_col: str = "seq") -> DataFrame:
    """Point-in-time lookup over an ``scd2_history`` result: the one
    version of each key live at ``as_of`` (a literal comparable to the
    history's ``effective_from`` type). Half-open intervals —
    ``effective_from <= as_of < effective_to`` — so an event AT the
    as-of instant is already visible and no two versions of a key can
    both match. Pure filter: pushes to the scan, zero shuffle."""
    ts = F.lit(as_of)
    return history.filter(
        (F.col("effective_from") <= ts)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > ts))
    ).drop(seq_col)


def scd2_apply_batch(
    history: DataFrame,
    events: DataFrame,
    keys: list[str],
    *,
    seq_col: str = "seq",
    op_col: str | None = None,
    delete_op: str = "D",
    tiebreak_cols: list[str] | None = None,
    broadcast_touched: bool = True,
) -> DataFrame:
    """Fold ONE new CDC event batch into an existing ``scd2_history``
    table without re-scanning the event log — the nightly-incremental
    face of ``scd2_history`` (which rebuilds from the full log).

    Closed versions are immutable: a new event can only (a) close the
    currently-open version of its key and (b) append versions after it.
    So the fold is delta-shaped:

    - UNTOUCHED keys (no event in the batch): every row passes through
      unchanged — via an anti-join against the batch's key-set
      (broadcast by default; a CDC batch's key-set is small).
    - TOUCHED keys: their CLOSED rows pass through unchanged; their
      OPEN row — which is exactly the last event of the key, carrying
      its attributes and ``effective_from`` — re-enters the fold as a
      pseudo-event alongside the new events, and ``scd2_history`` over
      that delta-sized union re-derives the key's tail (re-closing the
      old open version if a newer event arrived).

    Events must be strictly newer than the open version they extend
    (normal CDC: batches arrive in sequence order). A late event older
    than its key's open version would interleave into closed territory
    — re-fold from the full log (``scd2_history``) for backfills.

    Equivalence with the full re-fold across chained batches is pinned
    in tests. Cost: one shuffle of (batch ∪ touched open rows) — both
    delta-sized — plus the anti-join passes over the history scan.
    """
    ties = tiebreak_cols or []
    meta = ["effective_from", "effective_to", "is_current"]
    for c in meta:
        if c not in history.columns:
            raise ValueError(f"history lacks {c!r} — not an scd2_history output")
    batch_keys = events.select(*keys).dropDuplicates(keys)
    if broadcast_touched:
        batch_keys = F.broadcast(batch_keys)

    untouched = history.join(batch_keys, on=keys, how="left_anti")
    touched = history.join(batch_keys, on=keys, how="left_semi")
    closed = touched.filter(F.col("is_current") == 0)

    # The open row IS its key's last event: strip interval metadata and
    # re-enter it with its original sequence value. The history does not
    # carry the op column (scd2_history drops it) — the pseudo-event
    # gets a definite non-delete op, because the open row is by
    # construction a non-delete event (a NULL op would silently fall
    # out of the op != delete_op filter).
    open_rows = touched.filter(F.col("is_current") == 1)
    pseudo_op = F.lit("_open_" if delete_op != "_open_" else "_open2_")

    def _pseudo_col(c: str):
        if c == seq_col:
            return F.col("effective_from").alias(seq_col)
        if op_col is not None and c == op_col:
            return pseudo_op.alias(op_col)
        return F.col(c)

    pseudo = open_rows.select(*[_pseudo_col(c) for c in events.columns])
    refolded = scd2_history(
        pseudo.unionByName(events),
        keys,
        seq_col=seq_col,
        op_col=op_col,
        delete_op=delete_op,
        tiebreak_cols=tiebreak_cols,
    )
    return untouched.unionByName(closed.select(*untouched.columns)).unionByName(
        refolded.select(*untouched.columns)
    )
