"""Mergeable distinct-count sketches (Apache DataSketches HLL, exposed
through Spark's ``hll_sketch_agg`` / ``hll_union_agg`` built-ins).

The 100 TB problem this solves: "distinct users per day" is cheap, but
"distinct users this month/quarter" re-scans every day's raw events —
COUNT(DISTINCT) does not roll up. An HLL sketch DOES: each shard (day,
partition, export run) persists a few-KB binary sketch next to its
data, and any coarser rollup is a union of sketches — kilobytes moved,
zero raw re-scan, and the merged estimate is IDENTICAL to the estimate
a single pass over the union would have produced (HLL union is exact
over sketch state for a fixed ``lg_k``; pinned in tests).

Everything is JVM aggregate functions — no Python in the path. The
reference delegates all aggregation to MySQL (main.go:106), which has
no mergeable-sketch story at all; this is engine-native capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: log2 of the sketch register count. 12 → 4096 registers ≈ 1.6%
#: relative standard error and ~2-4 KB per sketch. One fixed default so
#: independently-produced shard sketches are always mergeable (unions
#: of mixed lg_k silently degrade to the coarser sketch).
DEFAULT_LG_K = 12


def distinct_sketches(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-group HLL sketch of ``key_col`` (+ exact row count).

    One partial+final hash aggregate — the shuffle carries one sketch
    (a few KB) per group per map task, never the keys themselves. The
    output is the shard-level artifact to persist alongside the shard's
    parquet: ``group_cols…, sketch binary, n_rows``.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def merge_sketch_estimates(
    sketches: DataFrame, rollup_cols: list[str]
) -> DataFrame:
    """Roll shard sketches up to ``rollup_cols`` granularity.

    Input is a (persisted) ``distinct_sketches`` output — kilobytes per
    shard — so this aggregation is driver-trivial at any corpus scale.
    ``approx_distinct`` is the estimate of the UNIONED sketch state,
    not a sum of per-shard estimates (distincts deduplicate across
    shards); ``n_rows`` sums exactly.
    """
    g = (
        sketches.groupBy(*rollup_cols)
        if rollup_cols
        else sketches.groupBy()
    )
    return g.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Count-min frequency sketches (row-form: mergeable by plain SUM)
# ---------------------------------------------------------------------------

#: Default count-min geometry: depth 5 × width 2048 → overestimate
#: ≤ e/width · N ≈ 0.13% of total weight with probability 1-e^-5 ≈ 99.3%,
#: at ~80 KB per sketch in row form. Fixed defaults keep independently
#: produced shard sketches mergeable (mixed geometries cannot be summed).
CMS_DEPTH = 5
CMS_WIDTH = 2048
CMS_SEED = 0x5EED


def _hash_pos(key_col: str, idx, n: int, seed: int):
    """Shared hash-folding geometry for the row-form families: bucket /
    bit index for one hash row — xxhash64 seeded per index, folded to
    [0, n). pmod, not %, so negative hashes land in range. ONE
    implementation on purpose: CMS cells and Bloom bits must fold
    identically forever or independently produced shard sketches stop
    merging; a divergent copy is a silent cross-version break."""
    return F.pmod(
        F.xxhash64(F.col(key_col), idx + F.lit(seed)), F.lit(n)
    ).cast("int")


def _cms_pos(key_col: str, depth_idx, width: int, seed: int):
    return _hash_pos(key_col, depth_idx, width, seed)


def cms_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> DataFrame:
    """Per-group count-min sketch of ``key_col`` frequencies, in ROW
    form: ``(group_cols…, d, pos, cnt)`` — one row per non-empty cell of
    the depth×width count matrix.

    Row form instead of a binary blob on purpose: Spark's built-in
    ``count_min_sketch`` aggregate produces a blob with NO SQL-side
    union, so rollups would bounce through the driver. Cells merge by
    plain SUM — any coarser rollup is one more aggregate over kilobyte-
    scale sketch rows (``cms_merge``), never the raw data, exactly the
    HLL pattern above. The explode is a d-way fan-out of constant-width
    rows before a partial+final hash agg: the shuffle carries at most
    depth×width cells per group per map task regardless of row count.

    The sketch answers "how often does key X occur" within ε·N (ε =
    e/width) with probability 1-e^-depth — per-key frequency at 100 TB
    without materializing a per-key aggregate, and unlike exact groupBy
    output its size is CAPPED by geometry, not cardinality.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"bad count-min geometry: depth={depth} width={width}")
    rows = df.select(
        *group_cols,
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    return (
        rows.withColumn("pos", _cms_pos(key_col, F.col("d"), width, seed))
        .groupBy(*group_cols, "d", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketches: DataFrame, rollup_cols: list[str]) -> DataFrame:
    """Roll shard sketches up to ``rollup_cols`` granularity: cells sum
    element-wise, and the merged sketch is IDENTICAL to the sketch a
    single pass over the unioned data would have produced (pinned in
    tests) — same contract as ``merge_sketch_estimates``."""
    return sketches.groupBy(*rollup_cols, "d", "pos").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> DataFrame:
    """Frequency estimates for every key in ``keys``: min over the depth
    cells each key hashes to — the classic count-min point query.

    Join direction is the scale story: the SKETCH is the broadcast side
    (its size is capped by geometry — at most depth×width rows — never
    by data volume), so ``keys`` may be arbitrarily large (e.g. every
    distinct key in the corpus) and never shuffles for the lookup. The
    left join + coalesce keeps EMPTY cells as zeros, so the min is over
    all ``depth`` cells exactly like the textbook query — a key absent
    from any one of its cells estimates 0. Estimates never undercount;
    overcounts are bounded by the geometry (quality-gated in tests).

    ``sketch`` must be single-group (one depth×width matrix): roll
    per-group sketches to the wanted granularity with ``cms_merge``
    (or filter one group) first.
    """
    extra = set(sketch.columns) - {"d", "pos", "cnt"}
    if extra:
        raise ValueError(
            f"cms_estimate needs a single-group sketch (columns d,pos,cnt) "
            f"but got extra columns {sorted(extra)} — roll up with "
            "cms_merge(sketches, []) or filter one group first; joining a "
            "per-group sketch would min() across groups and undercount"
        )
    probes = keys.dropDuplicates([key_col]).select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).withColumn("pos", _cms_pos(key_col, F.col("d"), width, seed))
    cells = sketch.select("d", "pos", "cnt")
    joined = probes.join(F.broadcast(cells), on=["d", "pos"], how="left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("approx_count")
    )


# ---------------------------------------------------------------------------
# Mergeable equi-width histograms (quantile estimates that roll up)
# ---------------------------------------------------------------------------

HIST_BINS = 256


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    *,
    lo: float,
    hi: float,
    bins: int = HIST_BINS,
) -> DataFrame:
    """Per-group fixed-geometry histogram of ``value_col`` in ROW form
    ``(group_cols…, bin, cnt)`` — the third mergeable sketch family
    (HLL = distincts, count-min = frequencies, this = distributions).

    ``lo``/``hi`` are part of the GEOMETRY and must be identical across
    every shard that will ever merge (like lg_k / depth×width above) —
    they come from domain knowledge or one prior bounded-metadata
    min/max pass, not from each shard's own data (per-shard ranges
    would make bins incomparable). Values outside [lo, hi) clamp to the
    edge bins, so a drifting tail degrades resolution, never
    correctness of counts. One partial+final aggregate; the shuffle
    carries ≤ ``bins`` cells per group per map task.

    ``percentile_approx`` answers one query in one pass; this persists
    a few-KB artifact per shard that answers ANY quantile later and
    rolls up by plain SUM (``histogram_merge``) without re-scanning —
    same nightly-artifact pattern as the HLL sketches.
    """
    if bins < 2 or not (hi > lo):
        raise ValueError(f"bad histogram geometry: bins={bins} lo={lo} hi={hi}")
    width = (hi - lo) / bins
    # clamp BEFORE narrowing to int: floor() yields a long, and a far
    # outlier (1e12 with width ~4) overflows int32 and wraps negative —
    # which greatest(0, ·) would then route into bin 0 instead of the
    # documented top edge bin.
    b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    b = F.least(
        F.lit(bins - 1).cast("long"), F.greatest(F.lit(0).cast("long"), b)
    ).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("bin", b)
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(sketches: DataFrame, rollup_cols: list[str]) -> DataFrame:
    """Roll shard histograms up: cells sum element-wise; the merged
    histogram is IDENTICAL to a single pass over the unioned data
    (pinned in tests)."""
    return sketches.groupBy(*rollup_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantile(
    sketch: DataFrame,
    qs: list[float],
    group_cols: list[str],
    *,
    lo: float,
    hi: float,
    bins: int = HIST_BINS,
) -> DataFrame:
    """Quantile estimates from a histogram sketch: per group and per q
    in ``qs``, linear interpolation inside the first bin whose
    cumulative count reaches q·total. Error ≤ one bin width —
    (hi-lo)/bins — by construction.

    Window arithmetic over ≤ ``bins`` rows per group (the SKETCH, never
    the data): a running sum ordered by bin, then the argmin bin per
    quantile. Output: ``group_cols…, q, est``.
    """
    from pyspark.sql import Window

    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in [0,1]: {qs}")
    width = (hi - lo) / bins
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*group_cols)
    cum = sketch.withColumn("_cum", F.sum("cnt").over(w)).withColumn(
        "_tot", F.sum("cnt").over(tot)
    )
    q_lit = F.explode(
        F.array(*[F.lit(float(q)) for q in qs])
    ).alias("q")
    probed = cum.select(*group_cols, "bin", "cnt", "_cum", "_tot", q_lit)
    # first bin whose cumulative count reaches the target rank
    hit = probed.filter(
        F.col("_cum") >= F.col("q") * F.col("_tot")
    )
    first = (
        hit.groupBy(*group_cols, "q")
        .agg(
            F.min_by(
                F.struct("bin", "cnt", "_cum", "_tot"), F.col("bin")
            ).alias("_h")
        )
        .select(
            *group_cols,
            "q",
            F.col("_h.bin").alias("_bin"),
            F.col("_h.cnt").alias("_cnt"),
            F.col("_h._cum").alias("_cum"),
            F.col("_h._tot").alias("_tot"),
        )
    )
    # interpolate the rank's position inside the hit bin
    frac = (
        F.col("q") * F.col("_tot") - (F.col("_cum") - F.col("_cnt"))
    ) / F.col("_cnt")
    est = F.lit(lo) + (F.col("_bin") + F.least(F.lit(1.0), frac)) * F.lit(width)
    return first.select(
        *group_cols, "q", F.round(est, 6).alias("est")
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketches — set algebra HLL cannot do
# ---------------------------------------------------------------------------

#: Fixed k so independently produced shard sketches are always mergeable
#: (mixed k degrades to the smaller sketch's accuracy at best; refusing
#: is simpler — like lg_k / depth×width / lo,hi above, k IS the
#: geometry). 1000, not a power of two, on purpose: Spark only rewrites
#: a rank filter into WindowGroupLimit (the map-side k-heap this
#: operator's scale story depends on) when the limit is ≤
#: spark.sql.optimizer.windowGroupLimitThreshold, whose VANILLA default
#: is 1000 — and the external driver supplies a vanilla session, so the
#: default k must prune under stock configs (plan-pinned). RSE ≈
#: 1/sqrt(k-2) ≈ 3.2%, ≤ 8 KB per sketch in row form.
KMV_K = 1000
KMV_SEED = 0x0BE5

#: 2^63 / 2^64 as exact doubles — signed-long hash → (0,1) normalizer.
_TWO63 = float(1 << 63)
_TWO64 = float(1 << 64)


def _kmv_u(key_col) -> "F.Column":
    """Normalize xxhash64's signed-long output to a uniform (0,1)
    double, order-preserving over the signed range: u = (h + 2^63)/2^64.
    +0.5/2^64 keeps u strictly positive so (k-1)/u never divides by 0."""
    h = F.xxhash64(F.col(key_col), F.lit(KMV_SEED))
    return (h.cast("double") + F.lit(_TWO63) + F.lit(0.5)) / F.lit(_TWO64)


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    k: int = KMV_K,
) -> DataFrame:
    """Per-group KMV sketch of ``key_col``: the ``k`` smallest distinct
    normalized hash values, in ROW form ``(group_cols…, hv)`` — the
    fourth mergeable family (HLL = distinct counts, count-min =
    frequencies, histogram = distributions, KMV = distinct counts WITH
    set algebra).

    Why another distinct sketch when HLL exists: HLL unions exactly but
    cannot intersect — "how much does corpus A overlap corpus B"
    (train-vs-eval contamination, cross-source dedup potential) only
    falls out of noisy inclusion-exclusion. KMV sketches support a
    direct Jaccard / intersection estimate (``kmv_overlap``) because
    the k smallest hashes of A∪B are a uniform coordinated sample of
    the union that both sides' sketches already contain.

    Plan shape: one shuffle on the group key; ``dense_rank() <= k``
    runs through WindowGroupLimit (plan-pinned), so each map task keeps
    a bounded k-heap and the exchange carries ≤ k candidate rows per
    group per task — never the corpus' distinct keys. dense_rank (not
    row_number) so duplicate keys cannot occupy multiple of the k
    slots; the post-filter dropDuplicates collapses them.
    """
    if k < 8:
        raise ValueError(f"kmv needs k >= 8, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy("hv")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, _kmv_u(key_col).alias("hv"))
        .withColumn("_r", F.dense_rank().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
        .dropDuplicates([*group_cols, "hv"])
    )


def kmv_merge(
    sketches: DataFrame, rollup_cols: list[str], *, k: int = KMV_K
) -> DataFrame:
    """Roll shard sketches up to ``rollup_cols`` granularity: union the
    rows, keep the k smallest distinct per rollup group. The merged
    sketch is IDENTICAL to the sketch one pass over the unioned data
    would have produced (pinned in tests) — the k smallest of a union
    are a subset of the union of each side's k smallest. Input is
    kilobytes per shard, so this is trivial at any corpus scale."""
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in rollup_cols]).orderBy("hv")
    return (
        sketches.select(*rollup_cols, "hv")
        .dropDuplicates([*rollup_cols, "hv"])
        .withColumn("_r", F.dense_rank().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], *, k: int = KMV_K
) -> DataFrame:
    """Distinct-count estimates per group from KMV sketches: the
    classic (k-1)/u_k estimator, where u_k is the largest retained
    hash. A group with fewer than k rows saw fewer than k distinct
    keys, so its count is EXACT (the sketch holds every distinct hash).
    Aggregates over sketch rows only — ≤ k per group."""
    g = (
        sketch.groupBy(*group_cols) if group_cols else sketch.groupBy()
    )
    agg = g.agg(
        F.count(F.lit(1)).alias("_n"), F.max("hv").alias("_uk")
    )
    est = F.when(
        F.col("_n") < k, F.col("_n").cast("double")
    ).otherwise((F.lit(k) - 1) / F.col("_uk"))
    return agg.select(
        *group_cols, F.round(est, 4).alias("approx_distinct")
    )


def kmv_overlap(
    sketch_a: DataFrame, sketch_b: DataFrame, *, k: int = KMV_K
) -> DataFrame:
    """Jaccard / intersection / union estimates between two corpora
    from their KMV sketches alone — no raw-data join.

    Method: the k smallest distinct hashes of A∪B (computable from the
    two sketches, since each side's k-minima contain every union
    minimum it contributes) form a coordinated uniform sample X of the
    union; J ≈ |{x ∈ X: x ∈ KMV(A) ∧ x ∈ KMV(B)}| / |X|, and
    |A∩B| ≈ J · |A∪B|. At 100 TB this answers "how much of corpus A is
    already in corpus B" by moving two ≤8 KB artifacts, not two
    corpora. Both inputs must be single-group sketches (column ``hv``
    only — roll up with ``kmv_merge(…, [])`` first); output is one row:
    ``jaccard, approx_intersection, approx_union``.
    """
    for side, sk in (("a", sketch_a), ("b", sketch_b)):
        if sk.columns != ["hv"]:
            raise ValueError(
                f"kmv_overlap needs single-group sketches (columns ['hv']); "
                f"side {side} has {sk.columns} — roll up with "
                "kmv_merge(sketches, []) or filter one group first"
            )
    a = sketch_a.select("hv", F.lit(1).alias("_a"))
    b = sketch_b.select("hv", F.lit(1).alias("_b"))
    both = a.join(b, "hv", "full_outer").select(
        "hv",
        (F.coalesce(F.col("_a"), F.lit(0)) + F.coalesce(F.col("_b"), F.lit(0)))
        .alias("_sides"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("hv")
    union_k = (
        both.withColumn("_r", F.dense_rank().over(w)).filter(F.col("_r") <= k)
    )
    agg = union_k.agg(
        F.count(F.lit(1)).alias("_n"),
        F.max("hv").alias("_uk"),
        F.sum(F.when(F.col("_sides") == 2, 1).otherwise(0)).alias("_shared"),
    )
    union_est = F.when(
        F.col("_n") < k, F.col("_n").cast("double")
    ).otherwise((F.lit(k) - 1) / F.col("_uk"))
    jac = F.col("_shared") / F.col("_n")
    return agg.select(
        F.round(jac, 4).alias("jaccard"),
        F.round(jac * union_est, 4).alias("approx_intersection"),
        F.round(union_est, 4).alias("approx_union"),
    )


# ---------------------------------------------------------------------------
# Bloom membership sketches (row-form: mergeable by set-union / OR)
# ---------------------------------------------------------------------------

#: Fixed geometry, same contract as every family above: m bits × k
#: probes per key. 2^20 bits / 7 probes → <1% false-positive rate up to
#: ~10^5 distinct keys per group, degrading gracefully (never false
#: NEGATIVES) as the filter saturates. Row form stores only SET bit
#: positions, so sketch size is min(k·n_distinct, m) rows — capped by
#: geometry at any data volume, like the CMS cell matrix.
BLOOM_M = 1 << 20
BLOOM_K = 7
BLOOM_SEED = 0xB100


def _bloom_pos(key_col: str, probe_idx, m: int, seed: int):
    return _hash_pos(key_col, probe_idx, m, seed)


def bloom_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """Per-group Bloom filter of ``key_col`` in ROW form
    ``(group_cols…, pos)`` — one row per SET bit — the fifth mergeable
    family, answering the one question the other four cannot:
    MEMBERSHIP ("was this key in that export?") without reading the
    export. (HLL/KMV count distincts, CMS estimates frequencies, the
    histogram holds distributions; none can test a specific key's
    presence.)

    One explode (k constant-width rows per input row) into a
    partial+final distinct aggregate — the shuffle carries at most
    min(k·distinct, m) positions per group per map task, never the
    keys. Merging filters is the set union of their positions
    (bitwise OR in row form — ``bloom_merge``), and the merged filter
    is IDENTICAL to a single-pass filter over the unioned data (pinned
    in tests). The 100 TB pattern: each nightly export ships its
    filter; "is doc X already ingested?" probes kilobyte artifacts
    instead of anti-joining years of corpus.
    """
    if m < 64 or k < 1:
        raise ValueError(f"bad bloom geometry: m={m} k={k}")
    rows = df.filter(F.col(key_col).isNotNull()).select(
        *group_cols,
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"),
    )
    return (
        rows.withColumn("pos", _bloom_pos(key_col, F.col("_i"), m, seed))
        .select(*group_cols, "pos")
        .dropDuplicates([*group_cols, "pos"])
    )


def bloom_merge(sketches: DataFrame, rollup_cols: list[str]) -> DataFrame:
    """Union shard filters up to ``rollup_cols`` granularity: the OR of
    row-form bit sets is a distinct over positions. Merged ≡ single
    pass over the unioned data (pinned) — same contract as every other
    family's merge."""
    return sketches.select(*rollup_cols, "pos").dropDuplicates(
        [*rollup_cols, "pos"]
    )


def bloom_contains(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """Membership probe: for every key in ``keys``, ``maybe_present``
    is true iff ALL k of its bit positions are set. Never a false
    negative (a key the filter saw always probes true); false positives
    bounded by the geometry (quality-gated in tests).

    Join direction is the scale story, same as ``cms_estimate``: the
    SKETCH broadcasts (≤ m rows by construction, regardless of data
    volume) and the probe keys — arbitrarily many — stream map-side,
    never shuffling for the lookup. ``sketch`` must be single-group
    (column ``pos`` only): roll up with ``bloom_merge(…, [])`` or
    filter one group first.
    """
    if sketch.columns != ["pos"]:
        raise ValueError(
            f"bloom_contains needs a single-group sketch (columns ['pos']); "
            f"got {sketch.columns} — roll up with bloom_merge(sketches, []) "
            "or filter one group first; probing a per-group sketch would "
            "OR bits across groups and inflate false positives"
        )
    probes = keys.dropDuplicates([key_col]).select(
        F.col(key_col),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"),
    ).withColumn("pos", _bloom_pos(key_col, F.col("_i"), m, seed))
    # Dedupe the (kilobyte-scale) sketch before probing: a raw union of
    # shard sidecars (read of sidecars/v=*_bloom without bloom_merge)
    # passes the columns guard but carries duplicate positions, and a
    # duplicated match would push a present key's hit SUM past k —
    # a false negative the membership contract forbids.
    hit = probes.join(
        F.broadcast(
            sketch.dropDuplicates(["pos"]).withColumn("_set", F.lit(1))
        ),
        "pos",
        "left",
    )
    return hit.groupBy(key_col).agg(
        (F.sum(F.coalesce(F.col("_set"), F.lit(0))) == k).alias(
            "maybe_present"
        )
    )


# ---------------------------------------------------------------------------
# Multi-column builders: ONE scan per family for sidecar exports
# ---------------------------------------------------------------------------
# The sidecar writer tags each sketch row with its source column and
# unions families across columns. Built per column, that costs
# N_columns scans of an export that was just written — at the 100 TB
# posture the scan count IS the cost. These variants compute every
# column's sketch rows in one pass: per-column expressions (native-type
# hashing — fusing raw values into one array would force a cast and
# silently change the hash geometry) are evaluated into an array of
# structs and exploded once. Each is pinned equal to the union of the
# per-column builds.


def distinct_sketches_multi(
    df: DataFrame, key_cols: list[str], *, lg_k: int = DEFAULT_LG_K
) -> DataFrame:
    """One-scan HLL sidecar table: ``(column, sketch, n_rows)`` for
    every named column — a single global aggregate evaluating all
    columns' ``hll_sketch_agg`` side by side."""
    if not key_cols:
        raise ValueError("distinct_sketches_multi requires columns")
    row = df.agg(
        *[
            F.hll_sketch_agg(c, F.lit(lg_k)).alias(f"_s{i}")
            for i, c in enumerate(key_cols)
        ],
        F.count("*").alias("_n"),
    )
    return row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"_s{i}").alias("sketch"),
                        F.col("_n").alias("n_rows"),
                    )
                    for i, c in enumerate(key_cols)
                ]
            )
        ).alias("_r")
    ).select("_r.column", "_r.sketch", "_r.n_rows")


def cms_sketch_multi(
    df: DataFrame,
    key_cols: list[str],
    *,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    seed: int = CMS_SEED,
) -> DataFrame:
    """One-scan CMS sidecar table: ``(column, d, pos, cnt)`` for every
    named column — positions are computed per column BEFORE the explode
    (ints fuse type-safely; raw values would not), so each column's
    cells are bit-identical to its single-column ``cms_sketch``."""
    if not key_cols:
        raise ValueError("cms_sketch_multi requires columns")
    if depth < 1 or width < 2:
        raise ValueError(f"bad count-min geometry: depth={depth} width={width}")
    cells = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(d).alias("d"),
                _cms_pos(c, F.lit(d), width, seed).alias("pos"),
            )
            for c in key_cols
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("_r"))
        .select("_r.column", "_r.d", "_r.pos")
        .groupBy("column", "d", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_sketch_multi(
    df: DataFrame,
    specs: list[tuple[str, float, float]],
    *,
    bins: int = HIST_BINS,
) -> DataFrame:
    """One-scan histogram sidecar table: ``(column, lo, hi, bins, bin,
    cnt)`` for every ``(column, lo, hi)`` spec — per-column bin indexes
    (each with its own [lo,hi) geometry, carried in the output like the
    sidecar contract requires) computed before a single explode. NULL
    values drop per column, exactly like ``histogram_sketch``."""
    if not specs:
        raise ValueError("histogram_sketch_multi requires specs")
    entries = []
    for c, lo, hi in specs:
        if bins < 2 or not (hi > lo):
            raise ValueError(
                f"bad histogram geometry: bins={bins} lo={lo} hi={hi}"
            )
        width = (hi - lo) / bins
        b = F.floor((F.col(c) - F.lit(lo)) / F.lit(width))
        b = F.least(
            F.lit(bins - 1).cast("long"), F.greatest(F.lit(0).cast("long"), b)
        ).cast("int")
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(float(lo)).alias("lo"),
                F.lit(float(hi)).alias("hi"),
                F.lit(bins).alias("bins"),
                F.when(F.col(c).isNotNull(), b).alias("bin"),
            )
        )
    return (
        df.select(F.explode(F.array(*entries)).alias("_r"))
        .select("_r.column", "_r.lo", "_r.hi", "_r.bins", "_r.bin")
        .filter(F.col("bin").isNotNull())
        .groupBy("column", "lo", "hi", "bins", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def kmv_sketch_multi(
    df: DataFrame, key_cols: list[str], *, k: int = KMV_K
) -> DataFrame:
    """One-scan KMV sidecar table: ``(column, hv)`` — per-column
    normalized hashes computed before the explode (NULL keys drop per
    column like ``kmv_sketch``), then one WindowGroupLimit-pruned
    dense_rank per column partition."""
    if not key_cols:
        raise ValueError("kmv_sketch_multi requires columns")
    if k < 8:
        raise ValueError(f"kmv needs k >= 8, got {k}")
    from pyspark.sql import Window

    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.when(F.col(c).isNotNull(), _kmv_u(c)).alias("hv"),
            )
            for c in key_cols
        ]
    )
    w = Window.partitionBy("column").orderBy("hv")
    return (
        df.select(F.explode(entries).alias("_r"))
        .select("_r.column", "_r.hv")
        .filter(F.col("hv").isNotNull())
        .withColumn("_rk", F.dense_rank().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
        .dropDuplicates(["column", "hv"])
    )


def bloom_sketch_multi(
    df: DataFrame,
    key_cols: list[str],
    *,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """One-scan Bloom sidecar table: ``(column, pos)`` — per-column bit
    positions for all k probes computed before the explode (NULL keys
    drop per column like ``bloom_sketch``)."""
    if not key_cols:
        raise ValueError("bloom_sketch_multi requires columns")
    if m < 64 or k < 1:
        raise ValueError(f"bad bloom geometry: m={m} k={k}")
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.when(
                    F.col(c).isNotNull(), _bloom_pos(c, F.lit(i), m, seed)
                ).alias("pos"),
            )
            for c in key_cols
            for i in range(k)
        ]
    )
    return (
        df.select(F.explode(entries).alias("_r"))
        .select("_r.column", "_r.pos")
        .filter(F.col("pos").isNotNull())
        .dropDuplicates(["column", "pos"])
    )


def category_sketch_multi(
    df: DataFrame, specs: list[tuple[str, int]]
) -> DataFrame:
    """One-scan top-k CATEGORY sidecar: ``(column, cat, cnt)`` for
    every ``(column, k)`` spec — the named top-k categories (EXACT
    counts), the tail folded into ``__other__``, NULLs counted as
    ``__null__``. The artifact that makes categorical drift
    (``operators/drift.py``) a sidecar-vs-sidecar comparison like the
    histogram path, instead of two raw-table scans.

    Plan: one explode over the (column, value) pairs → one partial-
    aggregated count (the exchange carries Σ|categories| rows per map
    task) → per-column top-k through WindowGroupLimit (rank pushdown
    keeps a bounded heap per task, same pattern as ``kmv_sketch``) →
    tail re-aggregated into one ``__other__`` row per column.
    Deterministic: count ties rank by category value.

    Unlike the other five families this artifact does NOT merge
    exactly across shards (a category inside one shard's top-k but
    outside another's has part of its count folded into ``__other__``)
    — it is a PER-VERSION drift/report input, not a rollup family;
    cross-period category rollups belong to ``cms_sketch`` (point
    frequencies, any key) which merges by SUM.
    """
    if not specs:
        raise ValueError("category_sketch_multi requires specs")
    for c, k in specs:
        if k < 1:
            raise ValueError(f"category sketch needs k >= 1, got {k} for {c!r}")
    from pyspark.sql import Window

    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.coalesce(F.col(c).cast("string"), F.lit("__null__")).alias(
                "cat"
            ),
        )
        for c, _k in specs
    ]
    counts = (
        df.select(F.explode(F.array(*entries)).alias("_r"))
        .select("_r.column", "_r.cat")
        .groupBy("column", "cat")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    k_for = F.element_at(
        F.create_map(
            *[F.lit(v) for c, k in specs for v in (c, k)]
        ),
        F.col("column"),
    )
    w = Window.partitionBy("column").orderBy(F.desc("cnt"), F.asc("cat"))
    ranked = counts.withColumn("_rn", F.row_number().over(w))
    top = ranked.filter(F.col("_rn") <= k_for).drop("_rn")
    other = (
        ranked.filter(F.col("_rn") > k_for)
        .groupBy("column")
        .agg(F.sum("cnt").alias("cnt"))
        .select("column", F.lit("__other__").alias("cat"), "cnt")
    )
    return top.unionByName(other)


def category_sketch(df: DataFrame, col: str, *, top_k: int = 100) -> DataFrame:
    """Single-column face of ``category_sketch_multi``."""
    return category_sketch_multi(df, [(col, top_k)])
