"""Advanced relational surface: as-of join (custom operator), recursive
CTEs (MySQL 8 WITH RECURSIVE parity — native in Spark 4), pivot, and the
remaining analytic window functions."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mysql2parquet_spark.io import load_table, register_tables
from mysql2parquet_spark.operators.asof import asof_join
from mysql2parquet_spark.operators.dedup import exact_dedup
from mysql2parquet_spark.queries import register


def T(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


@register(
    "join_asof",
    """
    WITH views AS (
      SELECT user_id, ts, event_id FROM (
        SELECT user_id, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        FROM events WHERE event_type = 'view'
      ) WHERE rn = 1
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts,
           v.event_id AS view_event_id
    FROM purchases p
    ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    "Custom operator: backward as-of join (most recent prior view per "
    "purchase) — union + last-non-null window, ONE shuffle, no Python; "
    "oracle is DuckDB's native ASOF JOIN.",
)
def join_asof(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    views = exact_dedup(
        e.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "event_id"
        ),
        ["user_id", "ts"],
        "event_id",
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    res = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
    )
    return res.select(
        "event_id",
        "user_id",
        F.date_format("ts_matched", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "view_ts"
        ),
        F.col("event_id_matched").alias("view_event_id"),
    )


_RECURSIVE_SQL = """
    WITH RECURSIVE seq(n) AS (
      SELECT 1
      UNION ALL
      SELECT n + 1 FROM seq WHERE n < 10
    )
    SELECT s.n AS bucket,
           CAST(COUNT(o_orderkey) AS BIGINT) AS order_cnt
    FROM seq s LEFT JOIN orders ON o_orderkey % 10 = s.n - 1
    GROUP BY s.n
"""


@register(
    "subquery_recursive",
    _RECURSIVE_SQL,
    "B29/MySQL-8 parity: WITH RECURSIVE (native in Spark 4) — the SAME "
    "SQL text runs on Spark SQL and DuckDB.",
)
def subquery_recursive(spark, sf_dir):
    register_tables(spark, sf_dir, only=["orders"])
    return spark.sql(_RECURSIVE_SQL)


@register(
    "agg_pivot",
    """
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_linestatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE l_linestatus = 'O') AS status_o
    FROM lineitem GROUP BY l_returnflag
    """,
    "B12: pivot (long→wide) — groupBy().pivot() with explicit values so "
    "the plan needs no extra value-discovery pass; oracle is the "
    "conditional-aggregation form.",
)
def agg_pivot(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .count()
    )
    return out.select(
        "l_returnflag",
        F.coalesce("F", F.lit(0)).alias("status_f"),
        F.coalesce("O", F.lit(0)).alias("status_o"),
    )


@register(
    "window_analytic",
    """
    SELECT o_orderkey, o_custkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
             AS first_price,
           ROUND(LAST_VALUE(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS last_price,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
             AS second_price,
           CAST(NTILE(4) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT)
             AS quartile
    FROM orders
    """,
    "B16/B17: FIRST/LAST/NTH_VALUE + NTILE — explicit full frames where "
    "the default running frame would change semantics.",
)
def window_analytic(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
        F.round(F.nth_value("o_totalprice", 2).over(wfull), 2).alias(
            "second_price"
        ),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "events_funnel",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT s.stage, s.n_users,
           ROUND(CAST(s.n_users AS DOUBLE)
                 / (SELECT COUNT(*) FROM v), 4) AS conversion
    FROM (
      SELECT 'view' AS stage, COUNT(*) AS n_users FROM v
      UNION ALL SELECT 'view>click', COUNT(*) FROM c
      UNION ALL SELECT 'view>click>purchase', COUNT(*) FROM p
    ) s
    ORDER BY n_users DESC, stage
    """,
    "Behavioral funnel: ordered view→click→purchase progression per "
    "user (strictly later timestamps at each stage), stage populations "
    "+ conversion rate. Each stage is a per-user MIN-aggregate joined "
    "to the previous stage's first-hit time — user-count rows only, so "
    "every join after the first aggregation is broadcast-sized even "
    "when the raw event log is 100 TB.",
)
def events_funnel(spark, sf_dir):
    """Ordered-sequence funnel. The event log is scanned once per stage
    with the stage predicate pushed to parquet; per-user stage tables
    are tiny (<= one row per user) so Catalyst broadcasts them."""
    ev = T(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stages = (
        v.agg(F.count("*").alias("n_users")).select(F.lit("view").alias("stage"), "n_users")
        .unionAll(
            c.agg(F.count("*").alias("n_users")).select(
                F.lit("view>click").alias("stage"), "n_users"
            )
        )
        .unionAll(
            p.agg(F.count("*").alias("n_users")).select(
                F.lit("view>click>purchase").alias("stage"), "n_users"
            )
        )
    )
    # Entry population as a broadcast one-row cross join, not a driver
    # .count() — the whole funnel stays one lazy plan.
    base = v.agg(F.count("*").alias("_base"))
    return (
        stages.crossJoin(F.broadcast(base))
        .select(
            "stage",
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("_base"), 4
            ).alias("conversion"),
        )
        .orderBy(F.col("n_users").desc(), "stage")
    )


@register(
    "events_retention",
    """
    WITH first_seen AS (
      SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_w
      FROM events GROUP BY user_id
    )
    SELECT STRFTIME(f.cohort_w, '%Y-%m-%d') AS cohort_week,
           CAST((EPOCH(DATE_TRUNC('week', e.ts)) - EPOCH(f.cohort_w)) / 604800
                AS BIGINT) AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_active
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY f.cohort_w, week_offset
    ORDER BY cohort_week, week_offset
    """,
    "Retention cohorts: users bucketed by first-seen week, distinct "
    "actives per (cohort, week offset). The first-seen table is one row "
    "per user — UNBOUNDED at scale, so the join back carries NO "
    "broadcast hint: AQE broadcasts it when it is small and falls back "
    "to a shuffled join on user_id when it is not (a forced hint would "
    "be an executor OOM at 100 TB that AQE cannot override). Both week "
    "boundaries are UTC Monday truncations so the offset division is "
    "exact on both engines.",
)
def events_retention(spark, sf_dir):
    """Cohort retention grid. One shuffle builds first_seen; the join
    back is hint-free (first_seen is one row per user — linear in the
    user population, NOT a bounded dim, so Catalyst/AQE must own the
    join strategy); the distinct-count shuffles (cohort, offset, user)
    triples — never raw events. Negative plan pin:
    tests/test_plans.py::test_retention_correct_without_broadcast."""
    ev = T(spark, sf_dir, "events")
    first_seen = (
        ev.groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_w"))
    )
    return (
        ev.join(first_seen, "user_id")
        .withColumn(
            "week_offset",
            (
                (
                    F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                    - F.unix_timestamp("cohort_w")
                )
                / 604800
            ).cast("bigint"),
        )
        .groupBy("cohort_w", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .select(
            F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_active",
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "events_trimmed_mean",
    """
    WITH nn AS (
      SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value)
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    ),
    nulls AS (
      SELECT event_type, COUNT(*) AS n_null
      FROM events WHERE value IS NULL GROUP BY event_type
    ),
    agg AS (
      SELECT event_type,
             MAX(n) AS n_rows,
             2 * MAX(CAST(FLOOR(n * 0.1) AS BIGINT)) AS n_trimmed,
             ROUND(CAST(SUM(v) / COUNT(*) AS DOUBLE), 6) AS mean_raw,
             ROUND(CAST(
               SUM(v) FILTER (rn > FLOOR(n * 0.1)
                              AND rn <= n - FLOOR(n * 0.1))
               / COUNT(*) FILTER (rn > FLOOR(n * 0.1)
                                  AND rn <= n - FLOOR(n * 0.1))
               AS DOUBLE), 6) AS trimmed_mean
      FROM nn GROUP BY event_type
    )
    SELECT agg.event_type,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(COALESCE(n_null, 0) AS BIGINT) AS n_null,
           CAST(n_trimmed AS BIGINT) AS n_trimmed,
           mean_raw, trimmed_mean
    FROM agg LEFT JOIN nulls USING (event_type)
    """,
    "D70: per-group TRIMMED mean over events.value (Tukey's robust "
    "location estimator -- the DROP counterpart of D29's winsorize "
    "CLAMP): sort each group, drop floor(n*0.1) rows from each end, "
    "average the rest; a trim-fraction of the group must be corrupted "
    "before the estimate moves. Kept multiset well-defined under ties "
    "(equal values straddling the cut contribute equally); kept sums "
    "in DECIMAL(18,2) -- exact and order-independent for 2-dp data "
    "(the B12 money discipline); one group-keyed window exchange + "
    "one group aggregate, no joins on the data path; NULLs excluded "
    "from ranking and counted separately, stated not silent.",
)
def events_trimmed_mean(spark, sf_dir):
    from mysql2parquet_spark.operators.numeric import (
        trimmed_mean_report,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    )
    return trimmed_mean_report(ev, "value", ["event_type"], trim=0.1)


@register(
    "events_mad_outliers",
    """
    WITH base AS (
      SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v
      FROM events WHERE value IS NOT NULL
    ),
    nn AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v)
               AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM base
    ),
    med AS (
      SELECT event_type, MAX(n) AS n_rows,
             CASE WHEN MAX(n) % 2 = 1
                  THEN 2 * SUM(v) FILTER (
                         rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
                         OR rn = CAST(FLOOR((n + 2) / 2.0) AS BIGINT))
                  ELSE SUM(v) FILTER (
                         rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
                         OR rn = CAST(FLOOR((n + 2) / 2.0) AS BIGINT))
             END AS med2
      FROM nn GROUP BY event_type
    ),
    dev AS (
      SELECT nn.event_type, med.n_rows, med.med2,
             ABS(2 * v - med2) AS dev2
      FROM nn JOIN med USING (event_type)
    ),
    dr AS (
      SELECT event_type, n_rows, dev2,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dev2)
               AS rn2
      FROM dev
    ),
    mad AS (
      SELECT event_type,
             CASE WHEN MAX(n_rows) % 2 = 1
                  THEN 2 * SUM(dev2) FILTER (
                         rn2 = CAST(FLOOR((n_rows + 1) / 2.0) AS BIGINT)
                         OR rn2 = CAST(FLOOR((n_rows + 2) / 2.0)
                                       AS BIGINT))
                  ELSE SUM(dev2) FILTER (
                         rn2 = CAST(FLOOR((n_rows + 1) / 2.0) AS BIGINT)
                         OR rn2 = CAST(FLOOR((n_rows + 2) / 2.0)
                                       AS BIGINT))
             END AS mad4
      FROM dr GROUP BY event_type
    ),
    fl AS (
      SELECT dev.event_type, dev.n_rows, dev.med2, mad.mad4,
             (1349 * dev2 > 3500 * mad4) AS isout
      FROM dev JOIN mad USING (event_type)
    ),
    agg AS (
      SELECT event_type,
             CAST(MAX(n_rows) AS BIGINT) AS n_rows,
             CAST(MAX(med2) AS DOUBLE) AS median_x2,
             CAST(MAX(mad4) AS DOUBLE) AS mad_x4,
             CAST(SUM(CASE WHEN isout THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers
      FROM fl GROUP BY event_type
    ),
    nulls AS (
      SELECT event_type, COUNT(*) AS n_null
      FROM events WHERE value IS NULL GROUP BY event_type
    )
    SELECT agg.event_type, n_rows,
           CAST(COALESCE(n_null, 0) AS BIGINT) AS n_null,
           median_x2, mad_x4, n_outliers
    FROM agg LEFT JOIN nulls USING (event_type)
    """,
    "D92: per-group ROBUST outlier report via median/MAD (Iglewicz & "
    "Hoaglin 1993 modified z-score, 0.6745*|v-med|/MAD > 3.5) -- "
    "unlike the D20 mean/stddev z-score, one wild value cannot move "
    "the gate that judges it (50% breakdown point). Everything that "
    "decides a flag is DECIMAL/integer: doubled order statistics "
    "(med2 = 2*median, mad4 = 4*MAD) avoid all division, and the "
    "cutoff clears fractions exactly (x4000: 1349*dev2 > 3500*mad4), "
    "so the REPORT -- counts included -- hash-adjudicates. Zero MAD "
    "(half the group tied) flags every non-median value: the "
    "estimator's documented degeneracy. Two group-keyed window "
    "exchanges (exact MAD needs two rank passes) + bounded medians "
    "relations broadcast back; NULLs counted separately.",
)
def events_mad_outliers(spark, sf_dir):
    from mysql2parquet_spark.operators.numeric import mad_outlier_report

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value"
    )
    return mad_outlier_report(ev, "value", ["event_type"])


@register(
    "events_changepoint",
    """
    WITH base AS (
      SELECT event_type, event_id, ts,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events WHERE value IS NOT NULL
    ),
    run AS (
      SELECT event_type, event_id, ts,
             SUM(v) OVER (PARTITION BY event_type
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS p,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY ts, event_id) AS k
      FROM base
    ),
    tot AS (
      SELECT event_type, SUM(v) AS tot, COUNT(*) AS n
      FROM base GROUP BY event_type
    ),
    t AS (
      SELECT run.event_type, event_id, ts, k, n,
             ABS(n * p - k * tot) AS abs_t
      FROM run JOIN tot USING (event_type)
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY abs_t DESC, k ASC) AS rn
      FROM t
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_rows,
           event_id AS cp_event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS cp_ts,
           CAST(k AS BIGINT) AS cp_k,
           CAST(FLOOR(CAST(abs_t AS DOUBLE) / CAST(n AS DOUBLE)
                      * 1000000.0) AS BIGINT) AS cusum_micro
    FROM best WHERE rn = 1
    """,
    "D94: per-group CUSUM changepoint report (Page 1954: the k "
    "maximizing |sum_{i<=k}(v_i - mean)| is the max-likelihood single "
    "mean-shift changepoint -- the offline face of every monitoring "
    "CUSUM chart, giving D18's drift dashboards a WHEN, not just a "
    "flag). No mean is ever divided: T_k = n*P_k - k*V is the CUSUM "
    "scaled by n, exact DECIMAL arithmetic; the argmax over "
    "(|T_k| DESC, k ASC) is a total order with (ts, event_id) "
    "tie-broken series order, so the reported changepoint row "
    "hash-adjudicates; the normalized magnitude floor(|T|/n*1e6) is "
    "the one mirrored double division. One group-keyed running-sum "
    "window + a |groups|-row totals broadcast + one argmax rank on "
    "the same key; NULL values excluded, stated.",
)
def events_changepoint(spark, sf_dir):
    from mysql2parquet_spark.operators.sequences import (
        cusum_changepoint,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts", "value"
    )
    return cusum_changepoint(ev, "value", ["event_type"])


@register(
    "events_attribution",
    """
    WITH conv AS (
      SELECT user_id, ts, CAST(value AS DECIMAL(18,2)) AS rev
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, ts AS tts, arg_max(event_type, event_id) AS ch
      FROM events WHERE event_type IN ('click', 'view')
      GROUP BY user_id, ts
    ),
    m AS (
      SELECT conv.user_id, conv.ts, conv.rev, touch.tts, touch.ch
      FROM conv
      ASOF LEFT JOIN touch
        ON conv.user_id = touch.user_id AND touch.tts <= conv.ts
    )
    SELECT CASE WHEN tts IS NOT NULL
                 AND tts >= ts - INTERVAL 168 HOURS
                THEN ch ELSE 'unattributed' END AS channel,
           COUNT(*) AS n_conversions,
           CAST(SUM(rev) AS DOUBLE) AS revenue
    FROM m GROUP BY 1
    """,
    "D78: last-touch conversion attribution (the single-touch "
    "baseline rule the data-driven attribution literature measures "
    "against, Shao & Li KDD'11): credit each purchase to the most "
    "recent preceding click/view by the same user within a 7-day "
    "lookback; no-touch conversions report under 'unattributed'. "
    "Match = the D1 backward as-of join (inclusive at equal ts); "
    "touches deduped per (user, ts) by max event_id (deterministic "
    "same-instant credit, as-of's unique-right contract); lookback = "
    "pure timestamp comparison, no epoch arithmetic; revenue summed "
    "in DECIMAL(18,2), emitted DOUBLE (B12 money discipline). ONE "
    "user-keyed as-of exchange + one (user,ts) argmax aggregate + a "
    "|channels|-row rollup with map-side combine.",
)
def events_attribution(spark, sf_dir):
    from mysql2parquet_spark.operators.sequences import (
        last_touch_attribution,
    )

    ev = T(spark, sf_dir, "events")
    return last_touch_attribution(ev)


@register(
    "events_sessions",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, CAST(value AS DECIMAL(18,2)) AS v,
             LAG(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev
      FROM events
    ),
    b AS (
      SELECT user_id, ts, event_id, v,
             CASE WHEN prev IS NULL
                    OR ts > prev + INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS is_new
      FROM o
    ),
    s AS (
      SELECT user_id, ts, v,
             SUM(is_new) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM b
    )
    SELECT user_id,
           CAST(session_idx AS BIGINT) AS session_idx,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           COUNT(*) AS n_events,
           CAST(datesub('second', MIN(ts), MAX(ts)) AS BIGINT)
             AS duration_s,
           CAST(SUM(v) AS DOUBLE) AS total_value
    FROM s GROUP BY user_id, session_idx
    """,
    "D84: batch gap-based sessionization report (the classic "
    "gaps-and-islands assignment with the industry-standard 30-min "
    "idle timeout): one row per session with ordinal index, "
    "start/end, depth, duration, and B12-decimal value total -- the "
    "per-session RELATION funnels/retention join against (B33 "
    "aggregates within native session windows; D10 handles streaming "
    "timeouts; this is the relational face). Determinism: (ts, "
    "event_id) total order within a user; duration via COMPLETE-"
    "interval timestamp arithmetic (Spark timestampdiff = DuckDB "
    "datesub -- datediff counts boundary CROSSINGS and is the wrong "
    "mirror, verified); timestamps emitted as microsecond strings "
    "(the D1 hash discipline). ONE user-keyed window exchange (lag + "
    "running sum share the spec -- one Window operator) + one "
    "(user, session) aggregate with map-side combine.",
)
def events_sessions(spark, sf_dir):
    from mysql2parquet_spark.operators.sequences import gap_sessions

    ev = T(spark, sf_dir, "events")
    s = gap_sessions(ev, gap_minutes=30)
    return s.select(
        "user_id",
        "session_idx",
        F.date_format(
            "session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("session_start"),
        F.date_format(
            "session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("session_end"),
        "n_events",
        "duration_s",
        "total_value",
    )
