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


def last_touch_attribution(
    events: DataFrame,
    *,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_hours: int = 168,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """LAST-TOUCH conversion attribution (D78 — the standard
    single-touch marketing-attribution rule; Shao & Li, KDD 2011
    formalize it as the baseline the data-driven models are measured
    against): credit each conversion to the MOST RECENT preceding
    touch event by the same user within ``lookback_hours``, and report
    per channel the conversions and the exact revenue they carried.
    Conversions with no in-window touch report under
    ``'unattributed'`` — absence is a row, not a silent drop.

    Semantics: the match is the D1 backward as-of join (touch visible
    at equal timestamps — the inclusive as-of contract); touches are
    first deduplicated per (user, ts) keeping the max ``id_col`` row,
    satisfying as-of's unique-right requirement and making the credit
    deterministic under same-instant touches. The lookback check is a
    pure timestamp comparison (no epoch arithmetic — engine-exact).

    Revenue follows the B12 money discipline: summed in
    DECIMAL(18,2), emitted as DOUBLE — order-independent and
    hash-exact.

    Scale shape: the as-of union-window costs ONE user-keyed exchange
    (the same sort a sort-merge join pays); the touch dedup is one
    (user, ts)-keyed argmax aggregate; the final rollup is a
    |channels|-row aggregate with map-side combine. No joins beyond
    the as-of fold, no windows wider than a user's own stream.
    """
    if lookback_hours < 1:
        raise ValueError(f"lookback_hours must be >= 1: {lookback_hours}")
    from mysql2parquet_spark.operators.asof import asof_join

    conv = events.filter(F.col(type_col) == conversion_type).select(
        F.col(user_col),
        F.col(ts_col),
        F.col(value_col).cast("decimal(18,2)").alias("_rev"),
    )
    touch = (
        events.filter(F.col(type_col).isin(*touch_types))
        .groupBy(user_col, ts_col)
        .agg(
            F.max(F.struct(F.col(id_col), F.col(type_col))).alias("_m")
        )
        .select(
            user_col, ts_col, F.col("_m")[type_col].alias("_channel")
        )
    )
    matched = asof_join(
        conv,
        touch.withColumnRenamed(ts_col, "_tts"),
        on=[user_col],
        left_ts=ts_col,
        right_ts="_tts",
        right_cols=["_channel"],
    )
    in_window = F.col("_tts_matched").isNotNull() & (
        F.col("_tts_matched")
        >= F.col(ts_col) - F.expr(f"INTERVAL {int(lookback_hours)} HOURS")
    )
    channel = F.when(
        in_window, F.col("_channel_matched")
    ).otherwise(F.lit("unattributed"))
    return (
        matched.select(channel.alias("channel"), "_rev")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.sum("_rev").cast("double").alias("revenue"),
        )
    )


def gap_sessions(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Batch GAP-BASED SESSIONIZATION report (D84 — the classic
    gaps-and-islands assignment every web-analytics stack defines:
    a session breaks when the same user is idle longer than
    ``gap_minutes``; the 30-minute default is the industry-standard
    timeout): one row per session — ``(user_id, session_idx,
    session_start, session_end, n_events, duration_s, total_value)``.
    The batch-relational face of the family: B33's ``session_window``
    aggregates within Spark's native session windows and D10's
    stateful sessionizer handles streaming timeouts; this produces
    the per-session RELATION (ordinal session index per user,
    duration, depth) that funnel/retention joins consume.

    Determinism: events order by (ts, event_id) within a user — ties
    at the same instant break by the unique id, so session boundaries
    are total-order stable; the gap test is pure timestamp
    comparison (no epoch arithmetic). ``total_value`` follows the
    B12 money discipline (DECIMAL(18,2) sum, DOUBLE out).

    Scale shape: ONE user-keyed exchange and ONE sort (the lag
    window and the running-sum boundary window share the partition
    and ordering spec, so the second Window node reuses the first's
    exchange+sort — plan-pinned), then a (user, session)-keyed
    aggregate with map-side combine. Per-user stream length bounds
    the window work — the user is the parallelism unit, the D30
    posture.
    """
    if gap_minutes < 1:
        raise ValueError(f"gap_minutes must be >= 1: {gap_minutes}")
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap = F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_col) > prev + gap), F.lit(1)
    ).otherwise(F.lit(0))
    sess = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(id_col),
        *(
            [F.col(value_col).cast("decimal(18,2)").alias("_v")]
            if value_col is not None
            else []
        ),
    ).withColumn(
        "session_idx",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.sum("_v").cast("double").alias("total_value"))
    out = (
        sess.groupBy(user_col, "session_idx")
        .agg(*aggs)
        .withColumn("session_idx", F.col("session_idx").cast("long"))
        # duration via calendar timestamp arithmetic, never epoch
        # conversion (epoch interpretation is where engines pick
        # different session-timezone rules — the D78 lesson)
        .withColumn(
            "duration_s",
            F.expr(
                "timestampdiff(SECOND, session_start, session_end)"
            ).cast("long"),
        )
    )
    cols = [
        user_col, "session_idx", "session_start", "session_end",
        "n_events", "duration_s",
    ]
    if value_col is not None:
        cols.append("total_value")
    return out.select(*cols)


def cusum_changepoint(
    events: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-group CUSUM CHANGEPOINT report (D94 — Page 1954's cumulative
    sum: the point where a series' running deviation from its overall
    mean peaks is the maximum-likelihood single changepoint of a
    mean-shift model; the offline face of every monitoring CUSUM
    chart). For each group, walk the series in time order and find the
    k maximizing ``|Σ_{i≤k}(v_i − mean)|`` — the level-shift location
    drift dashboards (D18) want a TIMESTAMP for, not just a flag.

    Exactness — no mean is ever divided: with ``P_k`` the running
    DECIMAL(18,2) prefix sum, ``V`` the group total and ``n`` the
    group count, ``T_k = n·P_k − k·V = n·Σ_{i≤k}(v_i − V/n)`` — the
    CUSUM scaled by n, an exact DECIMAL both engines agree on; the
    argmax over (|T_k| DESC, k ASC) is a total order, so the reported
    changepoint row hash-adjudicates. The normalized magnitude
    ``floor(|T_k|/n·1e6)`` (micro units of the raw CUSUM) is the one
    mirrored double division. NULL values are excluded from the
    series (stated, the D70 rule).

    Scale shape: ONE group-keyed exchange carries the whole report —
    the running sum and rank ride the (ts, id)-ordered window, the
    group total and count are full-partition window sums over the
    SAME partitioning (decimal/long — order-free, so the window form
    is bit-identical to the group aggregate + broadcast join it
    replaced, r14), and the argmax rank re-sorts in place. No join
    anywhere. Like D70/D92, the window partitions by the group key:
    per-key cost at high cardinality, a |groups|-task sort at low.
    """
    non_null = events.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(*group_cols)
    t = non_null.select(
        *group_cols,
        F.col(id_col),
        F.col(ts_col),
        F.col(value_col).cast("decimal(18,2)").alias("_v"),
    ).select(
        *group_cols,
        id_col,
        ts_col,
        F.sum("_v")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("_p"),
        F.row_number().over(w).alias("_k"),
        F.sum("_v").over(wn).alias("_tot"),
        F.count(F.lit(1)).over(wn).cast("long").alias("_n"),
    ).select(
        *group_cols,
        id_col,
        ts_col,
        "_k",
        "_n",
        F.abs(
            F.col("_n") * F.col("_p") - F.col("_k") * F.col("_tot")
        ).alias("_abs_t"),
    )
    w2 = Window.partitionBy(*group_cols).orderBy(
        F.col("_abs_t").desc(), F.col("_k").asc()
    )
    best = t.withColumn("_rn", F.row_number().over(w2)).filter(
        F.col("_rn") == 1
    )
    return best.select(
        *group_cols,
        F.col("_n").alias("n_rows"),
        F.col(id_col).alias("cp_event_id"),
        F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "cp_ts"
        ),
        F.col("_k").cast("long").alias("cp_k"),
        F.floor(
            F.col("_abs_t").cast("double")
            / F.col("_n").cast("double")
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("cusum_micro"),
    )
