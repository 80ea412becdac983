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
- ``tpch_q2_shape`` / ``q7`` / ``q8`` / ``q9`` / ``q11`` / ``q12`` /
  ``q15`` / ``q17`` / ``q20`` — the rest of the 22-query TPC-H suite,
  fixture-adapted (correlated MIN, dual-role nation joins, deep join
  trees, agg-vs-own-total HAVING, conditional pivot counts, view+MAX
  scalar, correlated AVG, nested IN chain); with these, every distinct
  optimizer shape in TPC-H is staged.
- ``dedup_cluster_cc``   — duplicate-cluster connected components over
  the shared-gram graph (iterative label-prop + pointer doubling vs a
  recursive-CTE transitive-closure oracle — the exact-oracle face of
  the iterative-graph family).
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
    WITH counts AS (
      SELECT event_type,
             time_bucket(INTERVAL 6 HOURS, ts) AS window_start,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events
      GROUP BY 1, 2
    ), base AS (
      SELECT event_type, window_start, n_events,
             COUNT(n_events) OVER w AS n_hist,
             AVG(n_events) OVER w AS mean,
             COALESCE(STDDEV_POP(n_events) OVER w, 0.0) AS std
      FROM counts
      WINDOW w AS (PARTITION BY event_type ORDER BY window_start
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, window_start, n_events,
           ROUND((n_events - mean) / std, 4) AS zscore
    FROM base
    WHERE n_hist >= 6 AND std > 0
      AND ABS((n_events - mean) / std) >= 2.0
    """,
)
def events_anomaly(spark, sf_dir):
    """Volume anomalies: 6-hour tumbling event counts per type, each
    window z-scored against the key's trailing 24 present windows
    (exclude-own-window baseline).

    SHAPE CHOICE (VERDICT r6 ask #4): the raw per-row z-score keyed by
    event_type alone concentrates the whole event table into
    |event_type| tasks — 5 in the fixture, still 5 at 100 TB, so the
    per-key series is unsplittable and parallelism never scales. This
    registered shape REDUCES FIRST (operators/anomaly.py
    window_count_anomaly): the count aggregation collapses the firehose
    to a |keys| x |windows| series with map-side partial aggregation,
    and only that bounded series ever enters a sorted window frame —
    two bounded exchanges, both skew-tolerant. The raw-series
    ``rolling_zscore`` remains the operator for genuinely
    high-cardinality keys (per-user, per-device), with its scale note
    in the docstring.

    Bucket alignment: Spark's ``F.window`` tumbles from the 1970-01-01
    epoch, DuckDB's ``time_bucket`` from its midnight-aligned origin —
    6 divides 24, so any midnight origin yields identical buckets.
    Constant-baseline breaks (std = 0) carry NULL zscore and are
    excluded on BOTH sides, so the flagged sets agree exactly; the
    zscore's sqrt-of-variance denominator keeps 4-decimal rounding off
    half-way boundaries."""
    from mysql2parquet_spark.operators.anomaly import window_count_anomaly

    ev = load_table(spark, sf_dir, "events")
    flagged = window_count_anomaly(
        ev, ["event_type"], "ts",
        window="6 hours", lookback=24, min_history=6, threshold=2.0,
    )
    return flagged.filter(
        F.col("is_anomaly") & F.col("zscore").isNotNull()
    ).select("event_type", "window_start", "n_events", "zscore")


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


# --- completing the TPC-H optimizer-shape suite ------------------------------
# q2/q7/q8/q9/q11/q12/q15/q17/q20 — with these, every distinct optimizer
# shape in the 22-query suite has a fixture-adapted staged entry (the
# reference delegates ALL of them to MySQL wholesale, main.go:106).
# partsupp does not exist in the fixture; q2/q11/q20 derive the
# part-supplier relation from lineitem instead, preserving the plan
# shape (correlated MIN, agg-vs-global-scalar HAVING, nested IN chain).


@_stage(
    "tpch_q2_shape",
    """
    WITH eu AS (
      SELECT l_partkey, l_suppkey, l_extendedprice
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ), mins AS (
      SELECT l_partkey AS mk, MIN(l_extendedprice) AS min_price
      FROM eu GROUP BY l_partkey
    )
    SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name,
                    eu.l_extendedprice AS min_price
    FROM eu
    JOIN mins ON eu.l_partkey = mins.mk AND eu.l_extendedprice = mins.min_price
    JOIN supplier ON s_suppkey = eu.l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON p_partkey = eu.l_partkey
    WHERE p_size <= 5
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    """,
)
def tpch_q2_shape(spark, sf_dir):
    """TPC-H Q2 shape (fixture-adapted: the part-supplier relation is
    derived from lineitem, there is no partsupp; extendedprice stands
    in for supplycost): the cheapest EUROPE supplier(s) per small
    part. The correlated MIN subquery is decorrelated the way Catalyst
    itself would — aggregate the region-bounded side once per part
    key, join back on (key, min) — so the region scan happens twice
    but each pass is an equi-join, never a per-part re-scan. The MIN
    equality is on RAW stored doubles (no arithmetic), so the
    double-typed join key is exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    eu = (
        li.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "n_name",
                "s_name", "s_acctbal")
    )
    mins = eu.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        eu.join(
            mins,
            (F.col("l_partkey") == F.col("mk"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .join(
            p.filter(F.col("p_size") <= 5),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                F.col("l_extendedprice").alias("min_price"))
        .distinct()
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


@_stage(
    "tpch_q7_shape",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             {_REV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_shape(spark, sf_dir):
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    year. The nation table joins TWICE under different roles (supplier
    side / customer side) with a disjunctive cross-pair predicate —
    the residual OR lands as a post-join filter over the two
    equi-joins, never a nested loop. Both nation sides are 25-row
    bounded dims (broadcast is AQE's call from real sizes); the fact
    chain lineitem-orders-customer shuffles on its keys."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("nk1"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"),
                  F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_8")
    ) | (
        (F.col("supp_nation") == "NATION_8") & (F.col("cust_nation") == "NATION_3")
    )
    joined = (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("nk1"))
        .join(n2, F.col("c_nationkey") == F.col("nk2"))
        .filter(pair)
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
    )
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@_stage(
    "tpch_q8_shape",
    f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             {_REV} AS volume, n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_shape(spark, sf_dir):
    """TPC-H Q8 shape: one nation's market share inside a region's
    customer base, per year — the deepest join tree in the suite
    (7 relations, nation twice under different roles). The share is a
    conditional-decimal-sum ratio: both sums are exact decimals, cast
    to double only for the final division (the q14 contract). No
    broadcast hints — part/customer grow with SF, nation/region are
    bounded and AQE sees their real sizes."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n1 = n.select(F.col("n_nationkey").alias("nk1"),
                  F.col("n_regionkey").alias("nrk1"))
    n2 = n.select(F.col("n_nationkey").alias("nk2"),
                  F.col("n_name").alias("nation"))
    zero = F.lit(0).cast("decimal(18,2)")
    joined = (
        p.filter(F.col("p_type") == "ECONOMY")
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            o.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("nk1"))
        .join(r.filter(F.col("r_name") == "ASIA"),
              F.col("nrk1") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("nk2"))
    )
    per_year = joined.select(
        F.year("o_orderdate").alias("o_year"),
        _rev().alias("volume"),
        "nation",
    )
    return (
        per_year.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume"))
                    .otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@_stage(
    "tpch_q9_shape",
    f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST({_REV} AS DECIMAL(18,4))
             - CAST(CAST(l_quantity AS DECIMAL(18,2))
                    * CAST(p_retailprice AS DECIMAL(18,2))
                    AS DECIMAL(18,4)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_shape(spark, sf_dir):
    """TPC-H Q9 shape (fixture-adapted: cost = quantity x retailprice
    since partsupp/supplycost do not exist): profit on name-matched
    parts per supplier nation and order year. The amount expression is
    decimal end-to-end with EXPLICIT width guards — (18,2)x(18,2)
    multiplies reach precision 37, and the unguarded subtraction would
    cross Spark's 38-cap and silently rescale, the exact cross-engine
    drift class the canonicalizer exists to catch; both engines
    therefore cast to DECIMAL(18,4) before subtracting. The %red%
    LIKE is a pushed scan filter on part."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = _rev().cast("decimal(18,4)") - (
        dec("l_quantity") * dec("p_retailprice")
    ).cast("decimal(18,4)")
    joined = (
        p.filter(F.col("p_name").like("%red%"))
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@_stage(
    "tpch_q11_shape",
    f"""
    WITH vals AS (
      SELECT l_partkey, SUM({_REV}) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
    FROM vals
    WHERE val > (SELECT CAST(SUM(val) AS DECIMAL(18,4))
                        * CAST(0.002 AS DECIMAL(4,3)) FROM vals)
    ORDER BY part_value DESC, l_partkey
    """,
)
def tpch_q11_shape(spark, sf_dir):
    """TPC-H Q11 shape (fixture-adapted: part value = shipped revenue
    from one nation's suppliers, no partsupp): per-part value HAVING
    value above a fraction of the GLOBAL total of the same aggregate —
    the agg-vs-scalar-subquery-over-itself shape. The grouped
    aggregate is computed once and reused for both sides (Spark keeps
    it as two consumers of one plan; the scalar side is a one-row
    cross join AQE broadcasts). Threshold arithmetic is width-guarded
    decimal on both engines (the q9 lesson: an unguarded
    decimal-38 x decimal literal silently rescales in Spark)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    vals = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name") == "NATION_3")
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("val"))
    )
    thresh = vals.agg(
        (
            F.sum("val").cast("decimal(18,4)")
            * F.lit(0.002).cast("decimal(4,3)")
        ).alias("_thresh")
    )
    return (
        vals.crossJoin(thresh)
        .filter(F.col("val") > F.col("_thresh"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@_stage(
    "tpch_q12_shape",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def tpch_q12_shape(spark, sf_dir):
    """TPC-H Q12 shape (fixture-adapted: returnflag stands in for
    shipmode, ship-lag for the commit/receipt-date lateness test):
    high- vs low-priority line counts for late shipments in one year.
    The lateness predicate compares two columns ACROSS the join
    (l_shipdate vs o_orderdate + 30d) so it cannot push below the
    join, but the year bounds on l_shipdate do push into the lineitem
    scan; the pivoted counts are one pass of conditional aggregation,
    not two scans."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (F.col("l_shipdate")
             >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
            & (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
    )
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@_stage(
    "tpch_q15_shape",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_shape(spark, sf_dir):
    """TPC-H Q15 shape: the top supplier(s) by quarterly revenue — an
    aggregate filtered by the MAX of the SAME aggregate (the view +
    scalar-subquery shape). The revenue CTE is built once; its MAX is
    a one-row side crossed back in (AQE broadcasts it), and the
    equality is on EXACT decimals, so ties surface identically on
    both engines — the reason the sum must not be a double."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (
        s.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(mx)
        .filter(F.col("total_rev") == F.col("_mx"))
        .select(
            "s_suppkey", "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@_stage(
    "tpch_q17_shape",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def tpch_q17_shape(spark, sf_dir):
    """TPC-H Q17 shape: small-quantity-order revenue for one brand,
    against a per-part average threshold — the correlated scalar AVG.
    Decorrelated as Catalyst would: one grouped AVG over lineitem,
    joined back by part key (two scans of lineitem, zero per-row
    subqueries). l_quantity is integral in the fixture, so the
    double AVG is an exact rational and 0.2*avg is the identical
    IEEE double on both engines — the threshold compare cannot
    flip a row cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    avgs = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg("l_quantity").alias("_avg_qty")
    )
    return (
        li.join(p.filter(F.col("p_brand") == "Brand#13"),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(avgs, F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("_avg_qty"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


@_stage(
    "tpch_q20_shape",
    """
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_8', 'NATION_12')
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 10)
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 100
      )
    ORDER BY s_suppkey
    """,
)
def tpch_q20_shape(spark, sf_dir):
    """TPC-H Q20 shape (fixture-adapted: shipped quantity stands in
    for partsupp availability): suppliers in named nations who moved
    real volume of small parts in a year — the nested-IN chain. Each
    IN level compiles to a LEFT SEMI join: part keys into the
    lineitem scan, then the HAVING-filtered supplier keyset into
    supplier. The quantity HAVING sums integral doubles (exact), and
    no level materializes to the driver."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    small = p.filter(F.col("p_size") <= 10).select("p_partkey")
    movers = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(small, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("_qty"))
        .filter(F.col("_qty") > 100)
        .select("l_suppkey")
    )
    return (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_3", "NATION_8", "NATION_12"))
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --- graph: duplicate-cluster connected components ---------------------------


@_stage(
    "dedup_cluster_cc",
    r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
    ),
    wins AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(t[u.i:u.i+7], ' ')) AS g
      FROM toks, unnest(range(1, len(t) - 8 + 2)) AS u(i)
      WHERE len(t) >= 8
    ),
    star AS (
      SELECT doc_id AS s, MIN(doc_id) OVER (PARTITION BY g) AS d FROM wins
    ),
    edges0 AS (
      SELECT DISTINCT s, d FROM star WHERE s <> d
    ),
    edges AS (
      SELECT s, d FROM edges0 UNION SELECT d, s FROM edges0
    ),
    nodes AS (
      SELECT DISTINCT s AS v FROM edges
    ),
    comp AS (
      WITH RECURSIVE reach(v, r) AS (
        SELECT v, v FROM nodes
        UNION
        SELECT e.d, c.r FROM reach c JOIN edges e ON e.s = c.v
      )
      SELECT v, MIN(r) AS component FROM reach GROUP BY v
    ),
    sizes AS (
      SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component
    )
    SELECT comp.v AS doc_id, comp.component, sizes.cluster_size
    FROM comp JOIN sizes USING (component)
    ORDER BY comp.component, comp.v
    """,
)
def dedup_cluster_cc(spark, sf_dir):
    """Duplicate-cluster resolution: connected components over the
    shared-8-token-window graph — every document that shares a
    verbatim window with another, labeled with its cluster (the
    cluster's minimum doc id) and the cluster size. This is the
    EXACT-oracle face of the iterative-graph family: unlike the
    MinHash CC variant (approximate by construction, rows-only), the
    gram edges are deterministic, so the full fixpoint labeling is
    hash-checked against a recursive-CTE transitive closure. Star
    edges keep |E| linear in (doc, gram) hits; the label-prop +
    pointer-doubling loop converges in O(log diameter) keyed-shuffle
    rounds (operators/graph.py)."""
    from mysql2parquet_spark.operators.graph import (
        connected_components,
        gram_star_edges,
    )

    docs = load_table(spark, sf_dir, "documents")
    edges = gram_star_edges(docs, text_col="text", id_col="doc_id", k=8)
    comp = connected_components(edges, src="src", dst="dst")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        comp.join(sizes, "component")
        .select(F.col("v").alias("doc_id"), "component", "cluster_size")
        .orderBy("component", "doc_id")
    )
