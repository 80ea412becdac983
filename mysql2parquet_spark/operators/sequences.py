"""Event-sequence path mining (D30): k-step paths over per-entity
ordered event streams.

``events_transitions`` (D22) gives the first-order Markov matrix —
one step. Journey analysis, funnel DISCOVERY (which funnels exist,
before D11 measures a chosen one), and bot fingerprinting all need the
k-step generalization: the most common length-k event-type paths users
actually walk, and per-entity path signatures.

Shape at scale:

- ``path_kgrams`` — ONE entity-keyed exchange (the sort window that
  orders each user's stream) feeding ``lead()`` k-1 times over the
  SAME window spec, so Catalyst plans a single Window operator and a
  single sort; the k-gram assembly is pure projection. The follow-up
  count is a path-keyed partial aggregation (map-side combine shrinks
  it to |distinct paths| per task) and top-N is a
  ``TakeOrderedAndProject`` heap, never a global sort.
- Per-user series length is bounded by user activity, not corpus size
  — the window key (the user) is the parallelism unit, the same
  posture as D11 funnels. A pathological single-entity firehose is a
  skew problem for AQE, not a plan change.

Determinism: ordering ties on ``ts`` are broken by the unique event id
in BOTH engines, and the path string is an unambiguous join of
event-type tokens (types never contain the separator), so path counts
are exact and the top-N tiebreak (count DESC, path ASC) is total.

The reference has no sequence surface (its single query is delegated
to MySQL, /root/reference/main.go:106); this is pipeline-north-star
coverage like the rest of Tier C/D.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def path_kgrams(
    events: DataFrame,
    entity_col: str,
    order_cols: list[str],
    token_col: str,
    *,
    k: int = 3,
    sep: str = ">",
) -> DataFrame:
    """Every length-``k`` consecutive path per entity, one row each.

    Columns: ``entity_col``, ``path`` (k tokens joined by ``sep``).
    Rows whose window runs off the end of the entity's stream (fewer
    than k-1 successors) are dropped — a k-gram is only a k-gram when
    complete. ONE exchange: all k-1 ``lead()`` calls share one window
    spec, so the plan carries a single sort-window over the entity key.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 is a plain GROUP BY)")
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    steps = [F.col(token_col)] + [
        F.lead(token_col, i).over(w) for i in range(1, k)
    ]
    out = events.select(
        entity_col,
        F.concat_ws(sep, *steps).alias("path"),
        # concat_ws silently SKIPS NULLs, which would alias a truncated
        # gram onto a real shorter one. Gate on EVERY step being
        # non-null — not just the last lead: a NULL token mid-stream
        # gives lead(k-1) non-null with an earlier step NULL, and the
        # truncated path would pass a last-lead-only gate (ADVICE r7
        # #2). All steps share the one window spec, so this adds
        # projection work only, no second sort.
        sum(
            (s.isNotNull().cast("int") for s in steps), F.lit(0)
        ).alias("_n_present"),
    )
    return out.filter(F.col("_n_present") == k).drop("_n_present")


def top_paths(
    events: DataFrame,
    entity_col: str,
    order_cols: list[str],
    token_col: str,
    *,
    k: int = 3,
    top: int = 20,
    sep: str = ">",
) -> DataFrame:
    """The ``top`` most-walked k-step paths corpus-wide.

    Columns: ``path``, ``n_walks`` (total occurrences), ``n_entities``
    (distinct entities that walked it at least once). Plan: the
    ``path_kgrams`` window exchange, a (path, entity) pre-aggregate
    feeding an exact distinct count, then a top-N heap
    (count DESC, path ASC — a total order, so LIMIT is deterministic).
    """
    grams = path_kgrams(
        events, entity_col, order_cols, token_col, k=k, sep=sep
    )
    per_entity = grams.groupBy("path", entity_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    counts = per_entity.groupBy("path").agg(
        F.sum("_n").alias("n_walks"),
        F.count(F.lit(1)).alias("n_entities"),
    )
    return counts.orderBy(F.col("n_walks").desc(), "path").limit(top)
