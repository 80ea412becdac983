"""Queries STAGED for r7 registration (r6 froze the registry at 119 so
the 16-query adjudication backlog could drain — ``test_no_new_queries_
while_backlog``). Each entry here is a full (spark_fn, oracle_sql) pair
in the registry's own ``Query`` shape, parity-checked locally by
``tests/test_staged_queries.py`` with the SAME strict canonicalizer as
the registered set — so r7 registration is a mechanical move of these
entries into the registry plus head slots, with zero new code.

Staged set (ROTATION.md r7 plan + this round's operator additions):
- ``drift_psi``          — drift_report over two event slices
- ``skew_profile``       — key_skew_profile heavy-hitter report
- ``sketch_kmv_overlap`` — KMV Jaccard vs exact set algebra (k exceeds
  the slice cardinality at test SF, so the estimator is EXACT there)
- ``sketch_bloom_probe`` — Bloom membership vs an exact anti-join
- ``sample_split_group`` — group-disjoint split vs the same md5 bands
- ``tpch_q4_shape``      — EXISTS semi-join count (fixture-adapted)
- ``tpch_q14_shape``     — promo revenue share (conditional agg ratio)
- ``tpch_q19_shape``     — disjunctive multi-column join predicates
- ``events_anomaly``     — rolling z-score outliers (exclude-own-row)
- ``join_explosion``     — exact pre-join cardinality / blowup check
- ``tpch_q13_shape`` / ``q16`` / ``q21`` / ``q22`` — the remaining
  distinct TPC-H optimizer shapes (agg-of-agg over outer join, NOT IN +
  count-distinct, double-correlated EXISTS, scalar-subquery + anti)
- ``dedup_substring``    — exact repeated k-token-window profile (the
  sixth dedup family: sub-document span duplication)
- ``text_pmi``           — top-term co-occurrence PMI collocations
- ``events_transitions`` — per-user Markov transition matrix
- ``knn_classify``       — k-NN majority-label prediction over
  embeddings (similarity-search consumer shape)
- ``events_resample``    — hypertable-style gap-filled LOCF resample
- ``events_ohlc``        — open/high/low/close downsample per bucket
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table
from mysql2parquet_spark.queries import Query
from mysql2parquet_spark.queries.tierb import dec

STAGED: dict[str, Query] = {}


def _stage(name: str, oracle: str | None, doc: str = ""):
    def wrap(fn):
        if name in STAGED:
            raise ValueError(f"duplicate staged query: {name}")
        STAGED[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return wrap


_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"


def _rev():
    return dec("l_extendedprice") * (1 - dec("l_discount"))


# --- drift -----------------------------------------------------------------

_DRIFT_TERMS = """
        SELECT GREATEST(cnt_a / ta, 1e-6) AS sa,
               GREATEST(cnt_b / tb, 1e-6) AS sb,
               ta, tb
        FROM cells, tots
"""

_DRIFT_AGG = """
        SELECT CAST(MAX(ta) AS BIGINT) AS n_a,
               CAST(MAX(tb) AS BIGINT) AS n_b,
               ROUND(SUM((sa - sb) * (LN(sa) - LN(sb))), 6) AS psi,
               ROUND(SUM((sa * (LN(sa) - LN((sa+sb)/2.0))
                          + sb * (LN(sb) - LN((sa+sb)/2.0))) / 2.0), 6) AS js_div,
               ROUND(SUM(ABS(sa - sb) / 2.0), 6) AS tv_dist
        FROM terms
"""


@_stage(
    "drift_psi",
    f"""
    WITH a AS (
      SELECT LEAST(31, GREATEST(0, CAST(FLOOR(value / 12.5) AS INT))) AS bin,
             CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM events WHERE user_id % 2 = 0 AND value IS NOT NULL GROUP BY 1
    ), b AS (
      SELECT LEAST(31, GREATEST(0, CAST(FLOOR(value / 12.5) AS INT))) AS bin,
             CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM events WHERE user_id % 2 = 1 AND value IS NOT NULL GROUP BY 1
    ), cells AS (
      SELECT COALESCE(a.cnt, 0) AS cnt_a, COALESCE(b.cnt, 0) AS cnt_b
      FROM a FULL JOIN b USING (bin)
    ), tots AS (
      SELECT SUM(cnt_a) AS ta, SUM(cnt_b) AS tb FROM cells
    ), terms AS ({_DRIFT_TERMS}
    ), num AS ({_DRIFT_AGG}
    ), ca AS (
      SELECT COALESCE(event_type, '__null__') AS cat,
             CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM events WHERE user_id % 2 = 0 GROUP BY 1
    ), cb AS (
      SELECT COALESCE(event_type, '__null__') AS cat,
             CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM events WHERE user_id % 2 = 1 GROUP BY 1
    ), cells2 AS (
      SELECT COALESCE(ca.cnt, 0) AS cnt_a, COALESCE(cb.cnt, 0) AS cnt_b
      FROM ca FULL JOIN cb USING (cat)
    ), tots2 AS (
      SELECT SUM(cnt_a) AS ta, SUM(cnt_b) AS tb FROM cells2
    ), terms2 AS (
        SELECT GREATEST(cnt_a / ta, 1e-6) AS sa,
               GREATEST(cnt_b / tb, 1e-6) AS sb,
               ta, tb
        FROM cells2, tots2
    ), cat AS (
        SELECT CAST(MAX(ta) AS BIGINT) AS n_a,
               CAST(MAX(tb) AS BIGINT) AS n_b,
               ROUND(SUM((sa - sb) * (LN(sa) - LN(sb))), 6) AS psi,
               ROUND(SUM((sa * (LN(sa) - LN((sa+sb)/2.0))
                          + sb * (LN(sb) - LN((sa+sb)/2.0))) / 2.0), 6) AS js_div,
               ROUND(SUM(ABS(sa - sb) / 2.0), 6) AS tv_dist
        FROM terms2
    )
    SELECT 'value' AS "column", 'numeric' AS kind, n_a, n_b, psi, js_div, tv_dist,
           CASE WHEN psi < 0.1 THEN 'stable' WHEN psi < 0.25 THEN 'moderate'
                ELSE 'drifted' END AS verdict
    FROM num
    UNION ALL
    SELECT 'event_type', 'categorical', n_a, n_b, psi, js_div, tv_dist,
           CASE WHEN psi < 0.1 THEN 'stable' WHEN psi < 0.25 THEN 'moderate'
                ELSE 'drifted' END AS verdict
    FROM cat
    """,
)
def drift_psi(spark, sf_dir):
    """Nightly drift report between two event slices (even vs odd
    users): PSI / Jensen-Shannon / total-variation for the numeric
    ``value`` column (32-bin histogram sketches over [0, 400)) and the
    categorical ``event_type`` column. At 100 TB the numeric path reads
    two KB-scale sidecars, not the corpora (operators/drift.py)."""
    from mysql2parquet_spark.operators.drift import drift_report

    ev = load_table(spark, sf_dir, "events")
    return drift_report(
        ev.filter(F.col("user_id") % 2 == 0),
        ev.filter(F.col("user_id") % 2 == 1),
        numeric_cols={"value": (0.0, 400.0)},
        cat_cols=["event_type"],
        bins=32,
    )


# --- skew profile ----------------------------------------------------------


@_stage(
    "skew_profile",
    """
    WITH c AS (
      SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    ), t AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS total,
             CAST(COUNT(*) AS DOUBLE) AS nkeys
      FROM c
    ), top AS (
      SELECT * FROM c ORDER BY cnt DESC, l_partkey LIMIT 10
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, l_partkey) AS INT) AS rank,
           l_partkey,
           CAST(cnt AS BIGINT) AS cnt,
           ROUND(cnt / total, 6) AS share,
           ROUND(cnt / (total / nkeys), 6) AS skew_x_avg,
           CAST(CEIL(cnt / (total / nkeys)) AS INT) AS salt_hint
    FROM top, t
    """,
)
def skew_profile(spark, sf_dir):
    """Heavy-hitter profile of lineitem's join key (l_partkey): the
    measurement that chooses between plain shuffle, salted_join, and
    broadcast before a 100 TB join is launched (operators/scale.py
    key_skew_profile — TakeOrderedAndProject top-k, one agg scan)."""
    from mysql2parquet_spark.operators.scale import key_skew_profile

    return key_skew_profile(
        load_table(spark, sf_dir, "lineitem"), ["l_partkey"], top_k=10
    )


# --- sketches: KMV overlap / bloom probe -----------------------------------


@_stage(
    "sketch_kmv_overlap",
    """
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type IN ('click','view')),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type IN ('purchase','view')),
         m AS (
           SELECT CAST(SUM(CASE WHEN a.user_id IS NOT NULL
                                 AND b.user_id IS NOT NULL THEN 1 ELSE 0 END)
                       AS DOUBLE) AS inter,
                  CAST(COUNT(*) AS DOUBLE) AS uni
           FROM a FULL JOIN b ON a.user_id = b.user_id
         )
    SELECT ROUND(inter / uni, 4) AS jaccard,
           ROUND((inter / uni) * uni, 4) AS approx_intersection,
           ROUND(uni, 4) AS approx_union
    FROM m
    """,
)
def sketch_kmv_overlap(spark, sf_dir):
    """Corpus-overlap estimate from two KMV sketches alone (no raw
    join): Jaccard / intersection / union of the clicker-or-viewer vs
    purchaser-or-viewer user sets. k = 2^17 exceeds the slice
    cardinality at test SF, so the KMV estimator sits on its EXACT path
    (every distinct hash retained, estimate = true count) and an exact
    DuckDB set-algebra oracle hash-matches; at corpus scale the same
    code degrades to the (k-1)/u_k estimate over 8 KB artifacts."""
    from mysql2parquet_spark.operators.sketches import kmv_overlap, kmv_sketch

    ev = load_table(spark, sf_dir, "events")
    k = 1 << 17
    a = kmv_sketch(
        ev.filter(F.col("event_type").isin("click", "view")), "user_id", [], k=k
    )
    b = kmv_sketch(
        ev.filter(F.col("event_type").isin("purchase", "view")), "user_id", [], k=k
    )
    return kmv_overlap(a, b, k=k)


@_stage(
    "sketch_bloom_probe",
    """
    WITH probes AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderkey % 7 = 0
    ), members AS (
      SELECT DISTINCT c_custkey FROM customer
    )
    SELECT p.custkey,
           (m.c_custkey IS NOT NULL) AS maybe_present
    FROM probes p LEFT JOIN members m ON p.custkey = m.c_custkey
    ORDER BY p.custkey
    """,
)
def sketch_bloom_probe(spark, sf_dir):
    """Bloom-filter membership probe: build the sketch over customer
    keys, probe it with a deterministic slice of order custkeys. Bloom
    never yields false negatives; at the fixed 2^20-bit / 7-probe
    geometry and test-SF cardinalities the false-positive set is empty,
    so the probe hash-matches an exact anti-join oracle — while at
    100 TB the same row-form sketch is a KB-scale mergeable artifact
    (operators/sketches.py bloom_sketch/bloom_contains)."""
    from mysql2parquet_spark.operators.sketches import bloom_contains, bloom_sketch

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    sketch = bloom_sketch(cust, "c_custkey", [])
    probes = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    return bloom_contains(sketch, probes, "custkey").orderBy("custkey")


# --- leakage-safe split ----------------------------------------------------


@_stage(
    "sample_split_group",
    """
    WITH u AS (
      SELECT source,
             CAST(('0x' || SUBSTRING(MD5(source || CHR(31) || 'split'), 1, 8)) AS BIGINT)
               / 4294967296.0 AS uv
      FROM documents
    )
    SELECT source,
           CASE WHEN uv < 0.5 THEN 'train'
                WHEN uv < 0.75 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS cnt
    FROM u
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def sample_split_group(spark, sf_dir):
    """Leakage-safe train/val/test split keyed by document SOURCE: all
    rows of a source share one md5-banded label (group-disjoint by
    construction, zero shuffle to assign — operators/scale.assign_split),
    aggregated here to per-(source, split) counts so the oracle checks
    both the banding math and the disjointness."""
    from mysql2parquet_spark.operators.scale import assign_split

    docs = load_table(spark, sf_dir, "documents")
    return (
        # .5/.25/.25: every cumulative edge (0.5, 0.75) is exact in
        # binary, so the SQL oracle's band constants are bit-identical
        # to the float edges assign_split accumulates.
        assign_split(
            docs, ["source"], {"train": 0.5, "val": 0.25, "test": 0.25}
        )
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("source", "split")
    )


# --- TPC-H shapes ----------------------------------------------------------


@_stage(
    "tpch_q4_shape",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_shape(spark, sf_dir):
    """TPC-H Q4 shape (fixture-adapted: commit/receipt dates are not in
    the fixture, so the EXISTS tests late-shipping lines): priority
    count of orders with at least one line shipped after the order
    date. The EXISTS compiles to a LEFT SEMI join — lineitem is
    scanned once, never materialized per order (reference delegates
    this to MySQL wholesale, main.go:106)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    filt = o.filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01")
    )
    late = filt.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_stage(
    "tpch_q14_shape",
    f"""
    SELECT ROUND(
             100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                   / CAST(SUM({_REV}) AS DOUBLE), 4) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1997-03-01'
    """,
)
def tpch_q14_shape(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share over a shipping window.
    Conditional decimal aggregation (exact, order-independent sums on
    both engines; only the final ratio is a double). No broadcast hint
    on part — it grows linearly with SF, so the join strategy is AQE's
    call (VERDICT r5 'What's wrong' #1 contract)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = _rev()
    zero = F.lit(0).cast("decimal(18,2)")
    joined = li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-03-01")
    ).join(p, F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
                "double"
            )
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_revenue_pct")
    )


@_stage(
    "tpch_q19_shape",
    f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 1 AND 25)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 10 AND 40)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 40
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def tpch_q19_shape(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive multi-column predicates over an
    equi-join. Catalyst extracts the common p_partkey = l_partkey
    conjunct as the join key and leaves the OR-of-ANDs as a post-join
    filter — an equi-join plan, not a nested loop; the brand-filtered
    part side is a small fraction and broadcast is AQE's call."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (F.col("p_partkey") == F.col("l_partkey")) & (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(1, 25)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 40)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return li.join(p, cond).agg(
        F.sum(_rev()).cast("double").alias("revenue")
    )


# --- anomaly detection -----------------------------------------------------


@_stage(
    "events_anomaly",
    """
    WITH base AS (
      SELECT event_type, event_id, value,
             COUNT(value) OVER w AS n_hist,
             AVG(value)  OVER w AS mean,
             COALESCE(STDDEV_POP(value) OVER w, 0.0) AS std
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY event_id
                   ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, event_id,
           ROUND((value - mean) / std, 4) AS zscore
    FROM base
    WHERE n_hist >= 10 AND std > 0 AND value IS NOT NULL
      AND ABS((value - mean) / std) >= 1.5
    """,
)
def events_anomaly(spark, sf_dir):
    """Rolling z-score outliers on event values, per event type: each
    row judged against the trailing-50 baseline of its own key (the
    row excluded from its own baseline). Single-shuffle window plan
    (operators/anomaly.py rolling_zscore); threshold 1.5 keeps the
    flagged set non-empty on the uniform-ish fixture values (a bounded
    uniform never reaches 3 sigma — real telemetry tails do). The
    oracle compares the flagged set + zscore only: the baseline MEAN
    of 2-decimal fixture values lands exactly on .xxxx5 half-way
    points, where cross-engine ulp noise flips a 4-decimal round (the
    agg_salted lesson, SURVEY §2.2) — the zscore's irrational
    stddev denominator has no such boundary mass."""
    from mysql2parquet_spark.operators.anomaly import rolling_zscore

    ev = load_table(spark, sf_dir, "events")
    flagged = rolling_zscore(
        ev, "value", ["event_type"], "event_id",
        lookback=50, min_history=10, threshold=1.5,
    )
    return flagged.filter(F.col("is_anomaly")).select(
        "event_type", "event_id", "zscore"
    )


# --- join explosion estimate -----------------------------------------------


@_stage(
    "join_explosion",
    """
    WITH ca AS (SELECT o_orderkey AS k, COUNT(*) AS ca FROM orders GROUP BY 1),
         cb AS (SELECT l_orderkey AS k, COUNT(*) AS cb FROM lineitem GROUP BY 1),
         pk AS (SELECT ca.k, ca.ca * cb.cb AS prod FROM ca JOIN cb ON ca.k = cb.k),
         t AS (
           SELECT (SELECT COUNT(*) FROM orders)   AS rows_a,
                  (SELECT COUNT(*) FROM lineitem) AS rows_b,
                  COUNT(*) AS matched_keys,
                  CAST(SUM(prod) AS BIGINT) AS output_rows
           FROM pk
         ),
         tops AS (
           SELECT CAST(SUM(prod) AS BIGINT) AS top_key_rows
           FROM (SELECT prod FROM pk ORDER BY prod DESC, k LIMIT 5)
         )
    SELECT rows_a, rows_b, matched_keys, output_rows,
           ROUND(CAST(output_rows AS DOUBLE)
                 / CAST(GREATEST(rows_a, rows_b) AS DOUBLE), 4) AS explosion_x,
           top_key_rows
    FROM t, tops
    """,
)
def join_explosion(spark, sf_dir):
    """Pre-flight cardinality check for the orders⋈lineitem join: exact
    output row count, explosion factor, and heavy-key contribution from
    the two count tables alone (operators/scale.join_explosion_estimate
    — the measurement that predicts a many-to-many blowup BEFORE a
    100 TB join runs)."""
    from mysql2parquet_spark.operators.scale import join_explosion_estimate

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    return join_explosion_estimate(o, li, ["k"], top_k=5)


# --- time-series resample / gap fill ----------------------------------------


@_stage(
    "events_resample",
    """
    WITH ranked AS (
      SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS slot, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, time_bucket(INTERVAL '1 hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    obs AS (
      SELECT event_type, slot, COUNT(*) AS n_obs,
             MAX(CASE WHEN rn = 1 THEN value END) AS close
      FROM ranked GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, MIN(slot) AS lo, MAX(slot) AS hi FROM obs GROUP BY 1
    ),
    grid AS (
      SELECT bounds.event_type, g.slot
      FROM bounds,
           unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS g(slot)
    ),
    joined AS (
      SELECT grid.event_type, grid.slot,
             COALESCE(obs.n_obs, 0) AS n_obs, obs.close
      FROM grid LEFT JOIN obs
        ON grid.event_type = obs.event_type AND grid.slot = obs.slot
    )
    SELECT event_type,
           strftime(slot, '%Y-%m-%d %H:%M:%S') AS slot_start,
           CAST(n_obs AS BIGINT) AS n_obs,
           last_value(close IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY slot
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
           n_obs = 0 AS gap_filled
    FROM joined
    """,
)
def events_resample(spark, sf_dir):
    """Hypertable-style gap-filled resample: per event type, one row per
    hour from first to last observation, forward-filling empty hours
    with the last closing value (operators/timeseries.py::resample_locf
    — LOCF). Exact: values pass through with zero float arithmetic and
    intra-hour order ties break on event_id, so the full grid is
    oracle-checkable. The fill window runs over the hour grid (~720
    slots x 5 types here), never the event stream."""
    from mysql2parquet_spark.operators.timeseries import resample_locf

    ev = load_table(spark, sf_dir, "events")
    return resample_locf(
        ev, key_cols=["event_type"], ts_col="ts", value_col="value",
        id_col="event_id", unit="hour",
    )


@_stage(
    "events_ohlc",
    """
    WITH ranked AS (
      SELECT event_type, time_bucket(INTERVAL '1 day', ts) AS slot, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, time_bucket(INTERVAL '1 day', ts)
               ORDER BY ts, event_id) AS rn_open,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, time_bucket(INTERVAL '1 day', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
    )
    SELECT event_type,
           strftime(slot, '%Y-%m-%d %H:%M:%S') AS slot_start,
           COUNT(*) AS n_obs,
           MAX(CASE WHEN rn_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_close = 1 THEN value END) AS close
    FROM ranked GROUP BY 1, 2
    """,
)
def events_ohlc(spark, sf_dir):
    """Daily open/high/low/close downsample per event type
    (operators/timeseries.py::ohlc): the extreme-preserving rollup;
    open/close are (ts, event_id)-deterministic endpoints, high/low
    plain extremes, all raw double pass-through."""
    from mysql2parquet_spark.operators.timeseries import ohlc

    ev = load_table(spark, sf_dir, "events")
    return ohlc(
        ev, key_cols=["event_type"], ts_col="ts", value_col="value",
        id_col="event_id", unit="day",
    )


# --- k-NN majority-label classification ------------------------------------


@_stage(
    "knn_classify",
    """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv, label AS true_label
      FROM embeddings WHERE vec_id < 20
    ),
    c AS (
      SELECT vec_id, embedding, label FROM embeddings WHERE vec_id >= 20
    ),
    scored AS (
      SELECT q.query_id, q.true_label, c.vec_id, c.label,
             list_sum(list_transform(list_zip(c.embedding, q.qv),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / ( sqrt(list_sum(list_transform(c.embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * sqrt(list_sum(list_transform(q.qv,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) )
               AS score
      FROM c, q
    ),
    top AS (
      SELECT query_id, true_label, label FROM (
        SELECT query_id, true_label, label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, vec_id) AS rn
        FROM scored
      ) WHERE rn <= 5
    ),
    votes AS (
      SELECT query_id, true_label, label AS pred_label, COUNT(*) AS votes
      FROM top GROUP BY 1, 2, 3
    )
    SELECT query_id, true_label, pred_label, votes FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY votes DESC, pred_label) AS vr
      FROM votes
    ) WHERE vr = 1
    """,
)
def knn_classify(spark, sf_dir):
    """k-NN majority-vote label prediction for a bounded query set
    against the rest of the embedding corpus (k=5, cosine) — the
    similarity-search CONSUMER shape: retrieval feeding a downstream
    decision, here label transfer for weak annotation. Ties break on
    (votes desc, smaller label); neighbor ranking ties on (score desc,
    vec_id) — fully deterministic, so the whole prediction table is
    oracle-checkable (scores fold to bit-identical doubles in both
    engines, the similarity_pairs contract).

    Scale shape: the query side broadcasts (score_against), the corpus
    is scored in place with zero shuffle, and per-query top-5 prunes
    through WindowGroupLimit before any label join; the vote fold runs
    over a |queries| x 5 relation."""
    from mysql2parquet_spark.operators.similarity import brute_force_topk
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    c = e.filter(F.col("vec_id") >= 20)
    top = brute_force_topk(c, q, k=5)
    # top is |queries|*5 rows — AQE broadcasts it from its real size,
    # so the corpus-sized label relation never shuffles (no hint needed;
    # the staged-set sweep bans literal hints).
    labels = c.select("vec_id", "label")
    top_l = labels.join(top.select("query_id", "vec_id"), "vec_id")
    votes = top_l.groupBy("query_id", F.col("label").alias("pred_label")).agg(
        F.count(F.lit(1)).alias("votes")
    )
    vr = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc("pred_label")
    )
    best = (
        votes.withColumn("_vr", F.row_number().over(vr))
        .filter(F.col("_vr") == 1)
        .drop("_vr")
    )
    truth = q.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return best.join(truth, "query_id").select(
        "query_id", "true_label", "pred_label", "votes"
    )


# --- event-type transition matrix ------------------------------------------


@_stage(
    "events_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    c AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, next_type, cnt,
           ROUND(cnt / SUM(cnt) OVER (PARTITION BY prev_type), 6) AS prob
    FROM c
    """,
)
def events_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: for each (prev_type -> next_type) step, the count and
    the row-normalized transition probability — the journey-analysis
    primitive behind funnel discovery and bot detection (a user whose
    transition row concentrates on one self-loop is a script).

    Scale shape: ONE shuffle on user_id for the lag window (the same
    single-exchange contract as the B16-B18 window family), then the
    aggregate collapses the corpus to |types|² rows — the normalizing
    window runs over that bounded matrix, not the events table."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    norm = Window.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "next_type",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(norm), 6).alias("prob"),
    )


# --- exact-substring dedup -------------------------------------------------


@_stage(
    "dedup_substring",
    """
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ),
    wins AS (
      SELECT doc_id, u.i AS pos,
             md5(array_to_string(t[u.i:u.i+7], ' ')) AS g
      FROM toks, unnest(range(1, len(t) - 8 + 2)) AS u(i)
      WHERE len(t) >= 8
    ),
    dup AS (
      SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS d FROM wins GROUP BY g)
      WHERE d >= 2
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS dup_w
      FROM wins WHERE g IN (SELECT g FROM dup)
      GROUP BY doc_id
    )
    SELECT toks.doc_id,
           CAST(GREATEST(len(t) - 8 + 1, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(dup_w, 0) AS BIGINT) AS dup_windows,
           ROUND(COALESCE(dup_w, 0) / NULLIF(GREATEST(len(t) - 8 + 1, 0), 0), 6)
             AS dup_ratio
    FROM toks LEFT JOIN per_doc ON toks.doc_id = per_doc.doc_id
    """,
)
def dedup_substring(spark, sf_dir):
    """Exact-substring duplication profile over the corpus: per-doc
    counts of 8-token windows that appear verbatim in >= 2 distinct
    documents (operators/dedup.py::duplicated_window_counts — the
    sixth dedup family, repeated-span detection below the whole-doc
    granularity that fingerprint/MinHash dedup works at). Fully exact:
    window keys are md5 of the space-joined gram, so DuckDB computes
    the identical report."""
    from mysql2parquet_spark.operators.dedup import duplicated_window_counts

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_window_counts(docs, text_col="text", id_col="doc_id", k=8)


# --- term co-occurrence / PMI ----------------------------------------------


@_stage(
    "text_pmi",
    """
    WITH dt AS (
      SELECT DISTINCT doc_id, u.term
      FROM documents,
           unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS u(term)
      WHERE u.term <> ''
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM dt GROUP BY term),
    top AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 40),
    filt AS (SELECT dt.doc_id, dt.term, top.df FROM dt JOIN top USING (term)),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    pairs AS (
      SELECT a.term AS t1, b.term AS t2, COUNT(*) AS c_ab,
             MAX(a.df) AS ca, MAX(b.df) AS cb
      FROM filt a JOIN filt b ON a.doc_id = b.doc_id AND a.term < b.term
      GROUP BY a.term, b.term
      HAVING COUNT(*) >= 5
    )
    SELECT t1, t2, c_ab,
           ROUND(LN(CAST(c_ab AS DOUBLE) * n_docs / (ca * cb)), 6) AS pmi
    FROM pairs, n
    """,
)
def text_pmi(spark, sf_dir):
    """Document-level PMI between the corpus's 40 highest-document-
    frequency terms (operators/text.py::term_cooccurrence_pmi): which
    term pairs co-occur far beyond chance — the collocation signal
    corpus curation uses to spot templated text. Top-N fold is a
    TakeOrderedAndProject heap broadcast into the filter; the pair
    self-join meets only on the doc key with a bounded per-doc blowup."""
    from mysql2parquet_spark.operators.text import term_cooccurrence_pmi

    docs = load_table(spark, sf_dir, "documents")
    return term_cooccurrence_pmi(
        docs, text_col="text", id_col="doc_id", top_n=40, min_pairs=5
    )


# --- TPC-H shapes: q13 / q16 / q21 / q22 -----------------------------------


@_stage(
    "tpch_q13_shape",
    """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_shape(spark, sf_dir):
    """TPC-H Q13 shape: the customer-order-count DISTRIBUTION —
    aggregate of an aggregate over a LEFT join (zero-order customers
    must appear in the c_count = 0 bucket, which an inner join would
    silently drop). Two keyed exchanges, both with partial combine;
    the second aggregates |customers| rows down to |distinct counts|."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@_stage(
    "tpch_q16_shape",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand NOT IN ('Brand#1', 'Brand#2')
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_shape(spark, sf_dir):
    """TPC-H Q16 shape (fixture-adapted: supplier relationships come
    from lineitem, there is no partsupp table): distinct-supplier
    counts per part attribute with NOT IN / IN filters. The NOT IN is
    over literals (a pushed-down scan filter, Not(In(...)) in the
    parquet reader); COUNT(DISTINCT) expands to the two-phase
    distinct-aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    filt = p.filter(
        ~F.col("p_brand").isin("Brand#1", "Brand#2")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    return (
        li.join(filt, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@_stage(
    "tpch_q21_shape",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
      JOIN orders   ON o_orderkey = l1.l_orderkey
      JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def tpch_q21_shape(spark, sf_dir):
    """TPC-H Q21 shape (fixture-adapted: "late" = shipped > 60 days
    after the order date, since commit/receipt dates are not in the
    fixture): suppliers who were the SOLE late shipper on a
    multi-supplier finalized order. The hardest correlated shape in
    the suite — one EXISTS and one NOT EXISTS, both correlated on the
    order key with a supplier inequality: a left-semi then a left-anti
    join, each equi-keyed on l_orderkey with the <> as residual
    condition (never a cartesian)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late1 = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        )
        .select("l_orderkey", "l_suppkey")
    )
    other = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    other_late = late1.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    cand = late1.join(
        other,
        (F.col("o2_orderkey") == F.col("l_orderkey"))
        & (F.col("o2_suppkey") != F.col("l_suppkey")),
        "left_semi",
    ).join(
        other_late,
        (F.col("o3_orderkey") == F.col("l_orderkey"))
        & (F.col("o3_suppkey") != F.col("l_suppkey")),
        "left_anti",
    )
    return (
        cand.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@_stage(
    "tpch_q22_shape",
    """
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
          )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def tpch_q22_shape(spark, sf_dir):
    """TPC-H Q22 shape (fixture-adapted: nation key stands in for the
    phone country code, pending-order absence for order absence):
    above-average-balance customers with no pending orders, grouped by
    nation. Composes a scalar aggregate subquery (a one-row side — AQE
    broadcasts it from its real size, no hint needed), an anti join
    against the filtered order keys, and an exact decimal money sum."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    pending = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    rich = (
        c.crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(
            pending, F.col("o_custkey") == F.col("c_custkey"), "left_anti"
        )
    )
    return (
        rich.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
