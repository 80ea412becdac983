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
  inserts. Exactly ``MERGE ... WHEN MATCHED THEN UPDATE SET * WHEN NOT
  MATCHED THEN INSERT *``.
- optional ``deletes``: a key-set whose rows are dropped from the result
  (CDC tombstones), applied after the upsert.

Scale shape: one shuffle per side on the merge keys (the left-anti
join), union is shuffle-free. When the delta batch is small relative to
the snapshot — the normal CDC case — pass ``broadcast_source=True`` and
the whole merge is a single scan of the target with zero target-side
shuffle: broadcast-anti-join + union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    *,
    deletes: DataFrame | None = None,
    broadcast_source: bool = False,
) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``keys``; optionally drop
    ``deletes`` keys. Schemas must agree by name (unionByName).

    ``broadcast_source=True`` broadcasts the source key-set into the
    anti-join (and the delete key-set too) — use whenever the delta is
    small enough to broadcast; the target is then never shuffled.
    """
    if not keys:
        raise ValueError("merge_upsert requires at least one key column")
    missing = [k for k in keys if k not in target.columns or k not in source.columns]
    if missing:
        raise ValueError(f"merge keys missing from target/source: {missing}")

    src_keys = source.select(*keys).dropDuplicates(keys)
    if broadcast_source:
        src_keys = F.broadcast(src_keys)
    kept = target.join(src_keys, on=keys, how="left_anti")
    out = source.unionByName(kept)
    if deletes is not None:
        del_keys = deletes.select(*keys).dropDuplicates(keys)
        if broadcast_source:
            del_keys = F.broadcast(del_keys)
        out = out.join(del_keys, on=keys, how="left_anti")
    return out


def snapshot_merge(
    spark,
    snapshot_path: str,
    delta: DataFrame,
    keys: list[str],
    *,
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Read the current parquet snapshot, fold one delta batch in. The
    caller writes the result to the next snapshot path (write-audit-
    publish: never overwrite the snapshot being read)."""
    return merge_upsert(
        spark.read.parquet(snapshot_path),
        delta,
        keys,
        deletes=deletes,
        broadcast_source=True,
    )
