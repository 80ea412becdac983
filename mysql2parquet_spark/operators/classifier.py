"""Trained quality classifier — the fastText-style corpus filter (D75).

The GPT-3-era data recipe trains a cheap discriminative classifier to
score raw web text against a trusted reference domain and keeps the
documents the classifier likes (Brown et al. 2020, Appendix A: a
logistic-regression filter over hashed features, positives = curated
corpora, negatives = raw Common Crawl; Joulin et al. 2016's fastText is
the canonical cheap linear text classifier). The closed-form v1 here is
multinomial Naive Bayes over hashed unigram features (McCallum & Nigam
1998's event model) — the same bounded 16^hex_chars feature space as
D51's DSIR, but a two-class conditional model with a decision rule
rather than an importance ratio. The NB log-odds IS a linear scorer
w·x + b over the hashed bag (the fastText shape with closed-form
weights), so the v1 is already the published filter's functional form;
a gradient-trained LR can later reuse the identical feature relation.

Everything is engine-exact: per-bucket log-odds quantize ONCE to
integer micro-nats (the D48/D51 recipe), per-document scores are
order-independent int64 sums, and the keep decision is an integer
comparison — so the driver's value-hash oracle adjudicates the whole
surface, not a float approximation of it.

The reference exports text untouched (/root/reference/main.go:106);
this is Tier C / LLM-pipeline north-star coverage like C4/D51.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucketed_tokens(
    docs: DataFrame, id_col: str, text_col: str, hex_chars: int
) -> DataFrame:
    """(id, b) hashed-unigram relation — md5-hex-prefix buckets, the
    D51 discipline (the bucket KEY is the hex string so an ANSI-SQL
    oracle mirrors it char-for-char)."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .select(
            id_col, F.substring(F.md5("w"), 1, hex_chars).alias("b")
        )
    )


def classifier_features(
    docs: DataFrame,
    target_pred: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 2,
) -> DataFrame:
    """ONE tokenize pass shared by the NB and LR faces (r14, guide
    §2.1 "don't compute things twice"): the eager-checkpointed
    ``(id, b, c, _ct, _cn)`` relation ``nb_classifier_score`` builds
    internally, factored out so a query that trains BOTH classifiers
    over the same corpus (the D95 agreement audit) tokenizes once
    instead of twice. ``_ct``/``_cn`` are the per-(doc, bucket)
    class-conditional token counts; the LR label is derivable from
    them — ``_y = 1.0 iff _ct > 0`` reproduces the
    ``when(pred, 1.0).otherwise(0.0)`` coercion bit-for-bit
    (``_ct = c`` on a true-labeled doc, ``0`` on a false-labeled
    one, NULL on a NULL-labeled one, and NULL > 0 is NULL → 0.0) —
    so one relation carries both models' inputs."""
    if hex_chars < 1 or hex_chars > 4:
        raise ValueError(f"hex_chars must be in [1, 4]: {hex_chars}")
    tok = (
        docs.select(
            F.col(id_col),
            target_pred.alias("_t"),
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .select(
            id_col,
            "_t",
            # hex_chars rides as column metadata so a consumer scoring
            # with a DIFFERENT hex_chars fails loudly instead of
            # silently mis-smoothing (ADVICE r14 — the kb constant is
            # 16^hex_chars; metadata survives the groupBy key).
            F.substring(F.md5("w"), 1, hex_chars).alias(
                "b", metadata={"hex_chars": hex_chars}
            ),
        )
    )
    return (
        tok.groupBy(id_col, "b")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("_t").cast("long")).alias("_ct"),
            F.sum((~F.col("_t")).cast("long")).alias("_cn"),
        )
        .localCheckpoint(eager=True)  # tokenized once, shared
    )


def nb_log_odds(
    docs: DataFrame,
    target_pred: Column,
    *,
    text_col: str = "text",
    hex_chars: int = 2,
    k: float = 1.0,
) -> DataFrame:
    """Per-bucket Naive Bayes log-odds relation ``(b, lam_micro)``:
    ``lam(b) = ln P(b|target) − ln P(b|rest)`` with add-k smoothing
    over the fixed ``B = 16^hex_chars`` bucket space —
    ``ln((ct+k)/(T1+kB)) − ln((cn+k)/(T0+kB))``, quantized ONCE to
    integer micro-nats. One pass over the token relation computes both
    class bags (conditional aggregation, no second scan); the output
    is ≤ B rows by construction. An empty class degrades smoothly: all
    its probabilities collapse to the uniform k/(kB) floor rather than
    dividing by zero (k > 0 is enforced).
    """
    if hex_chars < 1 or hex_chars > 4:
        raise ValueError(f"hex_chars must be in [1, 4]: {hex_chars}")
    if k <= 0:
        raise ValueError(f"k must be > 0: {k}")
    n_buckets = 16**hex_chars
    # one scan, both class bags: conditional count per bucket
    tok = (
        docs.select(F.col(text_col), target_pred.alias("_is_t"))
        .select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("w"),
            "_is_t",
        )
        .filter(F.col("w") != "")
        .select(
            F.substring(F.md5("w"), 1, hex_chars).alias("b"), "_is_t"
        )
    )
    bags = tok.groupBy("b").agg(
        F.sum(F.col("_is_t").cast("long")).alias("ct"),
        F.sum((~F.col("_is_t")).cast("long")).alias("cn"),
    )
    totals = bags.agg(
        F.sum("ct").alias("t1"), F.sum("cn").alias("t0")
    )
    joined = bags.crossJoin(F.broadcast(totals))
    kb = float(k) * n_buckets
    lam = F.floor(
        (
            F.log(F.col("ct").cast("double") + F.lit(float(k)))
            - F.log(F.col("t1").cast("double") + F.lit(kb))
            - F.log(F.col("cn").cast("double") + F.lit(float(k)))
            + F.log(F.col("t0").cast("double") + F.lit(kb))
        )
        * F.lit(1_000_000.0)
    ).cast("long")
    return joined.select("b", lam.alias("lam_micro"))


def nb_classifier_score(
    docs: DataFrame,
    target_pred: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 2,
    k: float = 1.0,
    features: DataFrame | None = None,
) -> DataFrame:
    """Score every document with the trained NB quality classifier:
    ``(id_col, n_tokens, score_micro, pred_target)`` where
    ``score_micro = prior_micro + Σ_buckets count_d(b)·lam_micro(b)``
    (the NB log-odds of "looks like the target domain" in integer
    micro-nats; counts ≤ doc length, |lam| ≤ ~2·10⁷ micro-nats, sums
    ≤ ~10¹¹ — far inside int64) and ``pred_target = score_micro > 0``
    — the keep/drop decision of the published filter. The document
    prior ``ln((N1+k)/(N0+k))`` is quantized once and added as a
    constant, so the rule is the full MAP decision, not just the
    likelihood term. Documents with zero tokens carry no evidence and
    are absent (the D48/D51 contract — filter empties upstream).

    Self-training is the norm (label docs by a metadata predicate —
    trusted source vs rest — then score everyone, including the
    labeled); pass a pre-filtered frame to train on a split.

    Plan (r14 optimization — results bit-identical, pinned by the
    twins in tests/test_classifier.py): ONE tokenize pass builds a
    per-(doc, bucket) relation carrying the total count plus the
    per-class conditional counts (partial sums of the same
    ``_is_t``-cast expressions the two-pass form aggregated), so the
    class bags are a ≤16^hex_chars-row re-aggregate of the combined
    relation instead of a second full gram scan. The relation
    checkpoints once and feeds both the bag aggregate and the per-doc
    score aggregate; the log-odds relation and the 1-row prior
    broadcast onto it. One data-scale (id, bucket) exchange + one
    id-keyed exchange of combined rows + one tiny bucket exchange
    regardless of corpus size.
    """
    if hex_chars < 1 or hex_chars > 4:
        raise ValueError(f"hex_chars must be in [1, 4]: {hex_chars}")
    if k <= 0:
        raise ValueError(f"k must be > 0: {k}")
    n_buckets = 16**hex_chars
    # ``features=`` lets a caller that trains more than one classifier
    # over the same corpus (D95 agreement) pass the shared
    # classifier_features() relation — same arithmetic, one tokenize
    # pass instead of two (r14, guide §2.1). The relation must have
    # been built with the SAME hex_chars (the smoothing constant is
    # 16^hex_chars) — enforced via the metadata classifier_features
    # stamps on ``b`` (ADVICE r14); a hand-built relation without the
    # stamp is the caller's documented responsibility.
    if features is not None and "b" in features.columns:
        meta = features.schema["b"].metadata or {}
        if "hex_chars" in meta and meta["hex_chars"] != hex_chars:
            raise ValueError(
                f"features= was built with hex_chars={meta['hex_chars']}"
                f" but nb_classifier_score got hex_chars={hex_chars} — "
                "the add-k smoothing constant (16^hex_chars) would "
                "silently mis-score; pass matching hex_chars"
            )
    dcb = (
        features
        if features is not None
        else classifier_features(
            docs,
            target_pred,
            id_col=id_col,
            text_col=text_col,
            hex_chars=hex_chars,
        )
    )
    bags = dcb.groupBy("b").agg(
        F.sum("_ct").alias("ct"), F.sum("_cn").alias("cn")
    )
    totals = bags.agg(
        F.sum("ct").alias("t1"), F.sum("cn").alias("t0")
    )
    joined = bags.crossJoin(F.broadcast(totals))
    kb = float(k) * n_buckets
    lam_col = F.floor(
        (
            F.log(F.col("ct").cast("double") + F.lit(float(k)))
            - F.log(F.col("t1").cast("double") + F.lit(kb))
            - F.log(F.col("cn").cast("double") + F.lit(float(k)))
            + F.log(F.col("t0").cast("double") + F.lit(kb))
        )
        * F.lit(1_000_000.0)
    ).cast("long")
    lam = joined.select("b", lam_col.alias("lam_micro"))
    prior = docs.agg(
        F.floor(
            (
                F.log(
                    F.sum(target_pred.cast("long")).cast("double")
                    + F.lit(float(k))
                )
                - F.log(
                    F.sum((~target_pred).cast("long")).cast("double")
                    + F.lit(float(k))
                )
            )
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("prior_micro")
    )
    dc = dcb.select(id_col, "b", "c")
    return (
        dc.join(F.broadcast(lam), "b")  # ≤ 16^hex_chars-row relation
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("lam_micro")).alias("_like"),
        )
        .crossJoin(F.broadcast(prior))
        .select(
            id_col,
            "n_tokens",
            (F.col("_like") + F.col("prior_micro"))
            .cast("long")
            .alias("score_micro"),
            (F.col("_like") + F.col("prior_micro") > 0).alias(
                "pred_target"
            ),
        )
    )


def lr_classifier_score(
    docs: DataFrame,
    target_pred: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 2,
    epochs: int = 2,
    lr: float = 0.5,
    features: DataFrame | None = None,
    label_out: str | None = None,
) -> DataFrame:
    """GRADIENT-TRAINED logistic-regression quality classifier (D86 —
    the literal fastText/GPT-3-filter form: Joulin et al. 2016 train
    a linear classifier by gradient descent over hashed bag features;
    Brown et al. 2020 Appendix A use exactly such a trained filter).
    Full-batch gradient descent over the D51 hashed-count features,
    ``epochs`` rounds, zero-initialized — and EVERY quantity that
    crosses a shuffle is an integer: weights and bias live in
    micro-logits (int64), per-document logits are integer dot
    products, and each document's gradient contribution quantizes
    ONCE to micro units before the per-bucket sum, so training is
    order-independent, partitioning-independent, and (with the
    epochs unrolled) expressible as an exact ANSI-SQL oracle — a
    gradient-descent loop the driver hash-adjudicates end to end.

    Update rule per epoch (mirrored bit-for-bit in oracle and twin)::

        p_d   = 1 / (1 + exp(−z_d/1e6))          # double, same libm
        g_j   = Σ_d floor((p_d − y_d)·c_dj·1e6)  # int64
        w_j  −= floor(lr·g_j / N)                # micro-logits
        (bias: c ≡ 1)

    Returns ``(id_col, n_tokens, score_micro, pred_target)`` — the
    final-epoch logit in micro units and the decision ``> 0``.
    Documents with zero tokens are absent (the D48/D75 contract).
    ``label_out=`` emits the TRAINING label (the 0/1 coercion of
    ``target_pred``): a NULL predicate value trains as — and is
    emitted as — ``false``, NOT NULL (ADVICE r14, stated contract;
    the D96-D99 evaluation oracles apply the same CASE coercion, so
    the faces agree even on NULL-labeled corpora).
    The NB face (``nb_classifier_score``) remains the closed-form
    default; this is the calibrated-scores path when the bag prior
    mis-weights correlated features.

    Scale shape: per epoch — ONE Spark job over the checkpointed
    feature relation (per-doc logits are an id-keyed window; the
    ≤ 16^h-entry model rides the plan as a LITERAL map lookup — no
    join, no Python-RDD broadcast) reducing to a single
    ≤ 16^h-row bucket-keyed aggregate (map-side combined) that
    carries the weight gradient, the bias gradient and the doc count
    together. The only state that reaches the driver is that
    bounded-metadata gradient relation — the same ≤ 16^h + 1 rows the
    previous localCheckpoint+broadcast loop moved through the driver
    anyway — and the integer weight updates run on IEEE doubles with
    the identical operation order, so training is bit-identical
    (tests/test_classifier_lr.py twins). Nothing data-scale ever
    reaches the driver.

    Checkpoint lifecycle: the feature relation localCheckpoints
    EAGERLY up front (it is re-read every epoch), so each training
    run pins O(|docs| · |distinct buckets per doc|) rows of block
    storage until the SparkContext garbage-collects the RDD — the
    blocks are released on session GC, not on return. A caller
    embedding this in a loop over many corpora should expect that
    transient executor-storage footprint per run.
    """
    dc, weights, bias_q = _lr_train(
        docs,
        target_pred,
        id_col=id_col,
        text_col=text_col,
        hex_chars=hex_chars,
        epochs=epochs,
        lr=lr,
        features=features,
    )
    # Inline serve with the literal-map model: every bucket of dc is a
    # model key by construction, so the lookup never misses and the
    # scores are bit-identical to the broadcast-join serve
    # (tests/test_classifier_lr.py + the D100 parity pins).
    wq = _wq_lookup(weights)
    # ``label_out=`` rides the 0/1 training label out of the SAME
    # id-keyed aggregate (it is constant per doc in ``dc``), so the
    # D96/D98/D99 evaluation faces need no second documents scan +
    # id-keyed join to re-attach the label they trained on (r14,
    # guide §2.4 "remove shuffles outright"). Values are identical to
    # re-deriving the predicate: the training coercion maps a NULL
    # label to 0.0, exactly the CASE semantics the SQL oracles use.
    aggs = [
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(F.col("c") * wq).alias("_zl"),
    ]
    if label_out is not None:
        aggs.append((F.first("_y") == F.lit(1.0)).alias(label_out))
    cols = [
        F.col(id_col),
        F.col("n_tokens"),
        (F.col("_zl") + F.lit(bias_q).cast("long"))
        .cast("long")
        .alias("score_micro"),
        (F.col("_zl") + F.lit(bias_q).cast("long") > 0).alias(
            "pred_target"
        ),
    ]
    if label_out is not None:
        cols.append(F.col(label_out))
    return dc.groupBy(id_col).agg(*aggs).select(*cols)


def _wq_lookup(weights: dict[str, int]) -> Column:
    """The trained model as a LITERAL map-lookup column over the bucket
    key — ≤16^hex_chars entries of driver-held integers inlined into
    the plan, so per-epoch logits and inline serving need neither a
    join nor a Python-backed local relation (createDataFrame rows
    evaluate through a Python RDD on every broadcast build). Built
    from TWO array literals (``map_from_arrays``), not a
    ``create_map`` with 2·|model| child expressions: a hex_chars=4
    model is 65,536 entries, and a 131k-node literal forest pays the
    same janino-compilation blowup the D74b power chains did — an
    array literal is ONE constant regardless of size."""
    if not weights:
        return F.lit(None).cast("long")
    keys = sorted(weights)
    vals = [weights[b] for b in keys]
    return F.element_at(
        F.map_from_arrays(
            F.lit(keys), F.lit(vals).cast("array<bigint>")
        ),
        F.col("b"),
    )


def _lr_train(
    docs: DataFrame,
    target_pred: Column,
    *,
    id_col: str,
    text_col: str,
    hex_chars: int,
    epochs: int,
    lr: float,
    features: DataFrame | None = None,
):
    """The D86 training loop, factored so both the inline face and the
    D100 persisted-model build share it verbatim: returns the
    ``(id, bucket, count, label)`` feature relation plus the trained
    model as DRIVER-SIDE state — the ``{bucket: micro-logit}`` dict
    and the integer bias (both bounded metadata: ≤16^hex_chars + 1
    values).

    Plan (r14 optimization — results bit-identical, pinned by the
    Python twins in tests/test_classifier_lr.py): the label rides the
    feature relation (one tokenize pass, no second docs scan / distinct
    / id join), ``dc`` checkpoints once, and each epoch is ONE Spark
    job — per-doc logits via an id-keyed window with the model inlined
    as a literal map lookup, reduced to a single ≤16^hex_chars-row
    per-bucket aggregate carrying the weight gradient, the bias
    gradient (counted once per doc via a rank-1 flag) and the doc
    count. The epoch state that crosses the driver is the same bounded
    metadata the old loop moved through localCheckpoint+broadcast
    (≤16^hex_chars weights + 1 bias); the integer update arithmetic
    runs on IEEE doubles in Python — the identical operation order the
    old Catalyst expressions used — so weights are bit-identical.
    Per epoch the old loop paid two id-keyed exchanges (logit groupBy,
    resid join) + one bucket exchange + two checkpoints and ~6 jobs;
    now: one id exchange, one tiny bucket exchange, one job.
    """
    if hex_chars < 1 or hex_chars > 4:
        raise ValueError(f"hex_chars must be in [1, 4]: {hex_chars}")
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1: {epochs}")
    if not 0.0 < lr <= 10.0:
        raise ValueError(f"lr must be in (0, 10]: {lr}")
    if features is not None:
        # Shared classifier_features() relation (already checkpointed):
        # derive the 0/1 label from the class-conditional count —
        # ``_ct = c`` on a true-labeled doc (→ 1.0), ``0`` on a
        # false-labeled one (→ 0.0), NULL on a NULL-labeled one
        # (NULL > 0 is NULL → otherwise → 0.0) — bit-identical to the
        # ``when(pred, 1.0).otherwise(0.0)`` coercion below.
        dc = features.select(
            F.col(id_col),
            F.col("b"),
            F.col("c"),
            F.when(F.col("_ct") > 0, F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("_y"),
        )
    else:
        y01 = F.when(target_pred, F.lit(1.0)).otherwise(F.lit(0.0))
        tok = (
            docs.select(
                F.col(id_col),
                y01.alias("_y"),
                F.explode(
                    F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
                ).alias("w"),
            )
            .filter(F.col("w") != "")
            .select(
                id_col,
                "_y",
                F.substring(F.md5("w"), 1, hex_chars).alias("b"),
            )
        )
        dc = (
            tok.groupBy(id_col, "b")
            .agg(F.count(F.lit(1)).alias("c"), F.first("_y").alias("_y"))
            .localCheckpoint(eager=True)  # reused every epoch
        )
    lrf = float(lr)
    w_id = Window.partitionBy(id_col)
    w_rn = Window.partitionBy(id_col).orderBy("b")
    weights: dict[str, int] = {}
    bias_q = 0
    n_docs = 0
    for epoch in range(epochs):
        if epoch == 0:
            # zero-initialized model: z = 0, p = 0.5 exactly (the
            # oracle's unrolled epoch-1 simplification)
            r = F.lit(0.5) - F.col("_y")
        else:
            z = F.sum(F.col("c") * _wq_lookup(weights)).over(
                w_id
            ) + F.lit(bias_q).cast("long")
            p = F.lit(1.0) / (
                F.lit(1.0)
                + F.exp(-(z.cast("double") / F.lit(1_000_000.0)))
            )
            r = p - F.col("_y")
        per_bucket = (
            dc.select(
                "b",
                "c",
                r.alias("_r"),
                (F.row_number().over(w_rn) == 1).alias("_f"),
            )
            .groupBy("b")
            .agg(
                F.sum(
                    F.floor(
                        F.col("_r")
                        * F.col("c").cast("double")
                        * F.lit(1_000_000.0)
                    ).cast("long")
                ).alias("_g"),
                F.sum(
                    F.when(
                        F.col("_f"),
                        F.floor(
                            F.col("_r") * F.lit(1_000_000.0)
                        ).cast("long"),
                    )
                ).alias("_gb"),
                F.sum(F.col("_f").cast("long")).alias("_nd"),
            )
            .collect()  # bounded-metadata: ≤16^hex_chars gradient rows
        )
        if epoch == 0:
            n_docs = sum(row["_nd"] for row in per_bucket)
        if n_docs == 0:
            break  # empty feature relation: every serve face is empty
        gb = 0
        for row in per_bucket:
            weights[row["b"]] = weights.get(row["b"], 0) - math.floor(
                lrf * float(row["_g"]) / float(n_docs)
            )
            if row["_gb"] is not None:
                gb += row["_gb"]
        bias_q -= math.floor(lrf * float(gb) / float(n_docs))
    return dc, weights, bias_q


def _lr_serve(
    dc: DataFrame, model: DataFrame, bias: DataFrame, id_col: str
) -> DataFrame:
    """Score a bucketized feature relation against a trained model:
    broadcast the ≤16^hex_chars-row model + 1-row bias onto ONE
    id-keyed sum — zero training jobs."""
    return (
        dc.join(F.broadcast(model), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("wq")).alias("_zl"),
        )
        .crossJoin(F.broadcast(bias))
        .select(
            id_col,
            "n_tokens",
            (F.col("_zl") + F.col("bq")).cast("long").alias("score_micro"),
            (F.col("_zl") + F.col("bq") > 0).alias("pred_target"),
        )
    )


def lr_model_build(
    docs: DataFrame,
    target_pred: Column,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    hex_chars: int = 2,
    epochs: int = 2,
    lr: float = 0.5,
) -> None:
    """TRAIN-AT-WRITE-TIME for the D86 LR (D100 — the
    ivf_build/pq_build amortization contract applied to the trained
    filter): run the gradient loop ONCE and persist the trained
    artifact — the ≤16^hex_chars-row ``model`` (b, wq), the 1-row
    ``bias`` (bq), and a 1-row ``meta`` (hex_chars) sidecar — as
    parquet under ``path``. Every downstream face (scoring, D95
    agreement, D96 AUC, D98 calibration, D99 PR sweep) then serves
    from the artifact with ZERO training jobs, instead of each paying
    the full epochs-long training as the self-contained inline
    queries do.

    The artifact is bounded METADATA (≤16^hex_chars + 2 rows), so
    the write is trivially cheap; the training cost is the same one
    ``lr_classifier_score`` pays, spent once.
    """
    dc, weights, bias_q = _lr_train(
        docs,
        target_pred,
        id_col=id_col,
        text_col=text_col,
        hex_chars=hex_chars,
        epochs=epochs,
        lr=lr,
    )
    spark = docs.sparkSession
    model = spark.createDataFrame(
        sorted(weights.items()), "b string, wq bigint"
    )
    bias = spark.createDataFrame([(bias_q,)], "bq bigint")
    model.write.mode("overwrite").parquet(f"{path}/model")
    bias.write.mode("overwrite").parquet(f"{path}/bias")
    spark.range(1).select(
        F.lit(int(hex_chars)).cast("int").alias("hex_chars")
    ).write.mode("overwrite").parquet(f"{path}/meta")


def lr_model_score(
    spark,
    path: str,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents from a PERSISTED D100 model — the serving half
    of ``lr_model_build``: read the (b, wq)/(bq) artifact, bucketize
    the documents (``hex_chars`` comes from the meta sidecar, so
    serving cannot silently mismatch the trained feature space), and
    run the one-exchange broadcast-score plan. ZERO training jobs, no
    localCheckpoint, no touch of the training corpus — and because
    the persisted weights are exactly the integers the training loop
    produced, scores are bit-identical to ``lr_classifier_score`` on
    the same corpus (round-trip parity pinned in
    tests/test_lr_persisted.py), so even the persisted face keeps an
    EXACT oracle.
    """
    # bounded-metadata: the 1-row meta sidecar (hex_chars config)
    hex_chars = int(
        spark.read.parquet(f"{path}/meta").first()["hex_chars"]
    )
    model = spark.read.parquet(f"{path}/model")
    bias = spark.read.parquet(f"{path}/bias")
    dc = (
        _bucketed_tokens(docs, id_col, text_col, hex_chars)
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return _lr_serve(dc, model, bias, id_col)


def with_prob_micro(
    scored: DataFrame,
    *,
    score_col: str = "score_micro",
    out_col: str = "prob_micro",
) -> DataFrame:
    """Calibrated-PROBABILITY face of a micro-logit score (D89 —
    VERDICT r12 ask #6): ``prob_micro = floor(σ(score/1e6)·1e6)``,
    the logistic sigmoid quantized ONCE to integer micro-probabilities
    in [0, 1e6]. Downstream mixing (D44 temperature, D73 token
    budgets) and D42's ``score_calibrate`` want probabilities on a
    fixed grid, not raw logits; the sigmoid is strictly monotone so
    ranking is preserved up to the 1e-6 quantization step (ties only
    between scores whose probabilities agree to six decimals).

    Exactness: the float tree ``1/(1+exp(−z/1e6))·1e6`` is mirrored
    operator-for-operator in the SQL oracle (the same libm ``exp`` on
    identical doubles — the D86 training-loop recipe), then floored,
    so the column hash-adjudicates. Pure projection: no shuffle, no
    new exchange over the scored relation.
    """
    z = F.col(score_col).cast("double") / F.lit(1_000_000.0)
    p = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))) * F.lit(1_000_000.0)
    return scored.withColumn(out_col, F.floor(p).cast("long"))


def classifier_agreement(
    scored_a: DataFrame,
    scored_b: DataFrame,
    *,
    id_col: str = "doc_id",
    pred_col: str = "pred_target",
) -> DataFrame:
    """Cohen's KAPPA agreement between two classifiers (D95 — Cohen
    1960, "A coefficient of agreement for nominal scales": raw
    agreement corrected for the agreement two independent raters would
    reach by chance; the standard audit before trusting a cheap
    classifier as a proxy for an expensive one). Here: do the
    closed-form NB (D75) and the gradient-trained LR (D86) keep/drop
    the same documents?

    One output row: the 2×2 confusion counts (``n11`` both-keep …
    ``n00`` both-drop), raw agreement and kappa in integer micro
    units, and the Landis & Koch 1977 verbal band (``poor`` < 0 ≤
    ``slight`` ≤ 0.2 < ``fair`` ≤ 0.4 < ``moderate`` ≤ 0.6 <
    ``substantial`` ≤ 0.8 < ``almost_perfect``).

    Exactness: with N docs, ``kappa = (N·(n11+n00) − E) / (N² − E)``
    where ``E = (n11+n10)(n11+n01) + (n01+n00)(n10+n00)`` — numerator
    and denominator are exact int64 (N² overflows past N ≈ 3·10⁹
    docs — sample first at that scale, stated), and the one mirrored
    double division floor-quantizes to micro units, so the report
    hash-adjudicates. Documents scored by only one side are excluded
    by the inner join (both classifiers share the zero-token-absent
    contract, so the joined set is the common corpus).

    Scale shape: one id-keyed equi-join (both sides already partition
    by id out of their score aggregates) + ONE 1-row conditional
    aggregate.
    """
    a = scored_a.select(
        F.col(id_col), F.col(pred_col).alias("_pa")
    )
    b = scored_b.select(
        F.col(id_col), F.col(pred_col).alias("_pb")
    )
    j = a.join(b, id_col)
    counts = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("_pa") & F.col("_pb")).cast("long"))
        .cast("long")
        .alias("n11"),
        F.sum((F.col("_pa") & ~F.col("_pb")).cast("long"))
        .cast("long")
        .alias("n10"),
        F.sum((~F.col("_pa") & F.col("_pb")).cast("long"))
        .cast("long")
        .alias("n01"),
        F.sum((~F.col("_pa") & ~F.col("_pb")).cast("long"))
        .cast("long")
        .alias("n00"),
    )
    n = F.col("n_docs")
    e = (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01")) + (
        F.col("n01") + F.col("n00")
    ) * (F.col("n10") + F.col("n00"))
    num = n * (F.col("n11") + F.col("n00")) - e
    den = n * n - e
    kappa = F.when(
        den != 0,
        F.floor(
            num.cast("double") / den.cast("double") * F.lit(1_000_000.0)
        ).cast("long"),
    )
    agree = F.floor(
        (F.col("n11") + F.col("n00")).cast("double")
        / n.cast("double")
        * F.lit(1_000_000.0)
    ).cast("long")
    band = (
        F.when(kappa.isNull(), F.lit("undefined"))
        .when(kappa < 0, F.lit("poor"))
        .when(kappa <= 200_000, F.lit("slight"))
        .when(kappa <= 400_000, F.lit("fair"))
        .when(kappa <= 600_000, F.lit("moderate"))
        .when(kappa <= 800_000, F.lit("substantial"))
        .otherwise(F.lit("almost_perfect"))
    )
    return counts.select(
        "n_docs",
        "n11",
        "n10",
        "n01",
        "n00",
        agree.alias("agree_micro"),
        kappa.alias("kappa_micro"),
        band.alias("band"),
    )


def calibration_report(
    scored: DataFrame,
    label_col: str,
    *,
    prob_col: str = "prob_micro",
    bins: int = 10,
) -> DataFrame:
    """Classifier RELIABILITY report (D98 — the calibration curve /
    reliability diagram of DeGroot & Fienberg 1983, popularized for
    modern classifiers by Guo et al. 2017: bucket predictions by
    predicted probability, compare each bucket's MEAN prediction to
    its EMPIRICAL positive rate; a classifier whose 0.8-bucket is
    right 60% of the time is miscalibrated even if its AUC is
    perfect — the audit that decides whether D89's probabilities can
    be TRUSTED as probabilities by the D44/D73 mixers).

    One row per non-empty probability bucket:
    ``(bin, n, n_pos, mean_prob_micro, pos_rate_micro, gap_micro)``
    where ``bin = min(prob_micro·bins div 1e6, bins−1)`` (equal-width
    buckets on the micro grid), the bucket means/rates are integer
    ``div``s of int64 sums, and ``gap`` is their absolute difference
    — the per-bucket calibration error whose n-weighted average is
    the ECE. EVERYTHING is integer arithmetic (sums of micro units,
    counts, `div`) — no doubles at all, so the report
    hash-adjudicates with no quantization recipe.

    Scale shape: one projection + ONE ≤``bins``-row aggregate with
    map-side combine — the cheapest possible audit of a scored
    corpus. Empty buckets are absent (stated; a reliability plot
    needs no row to show nothing).
    """
    if bins < 2 or bins > 1000:
        raise ValueError(f"bins must be in [2, 1000]: {bins}")
    b = F.least(
        F.expr(f"({prob_col} * {bins}) div 1000000").cast("long"),
        F.lit(bins - 1),
    )
    base = scored.select(
        b.alias("bin"),
        F.col(prob_col).alias("_p"),
        F.col(label_col).cast("long").alias("_y"),
    )
    agg = base.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_y").cast("long").alias("n_pos"),
        F.sum("_p").cast("long").alias("_sp"),
    )
    return agg.select(
        "bin",
        "n",
        "n_pos",
        F.expr("_sp div n").cast("long").alias("mean_prob_micro"),
        F.expr("(n_pos * 1000000) div n")
        .cast("long")
        .alias("pos_rate_micro"),
        F.abs(
            F.expr("_sp div n") - F.expr("(n_pos * 1000000) div n")
        )
        .cast("long")
        .alias("gap_micro"),
    )


def pr_curve_report(
    scored: DataFrame,
    label_col: str,
    *,
    score_col: str = "prob_micro",
    thresholds: tuple[int, ...] = (
        100_000,
        200_000,
        300_000,
        400_000,
        500_000,
        600_000,
        700_000,
        800_000,
        900_000,
    ),
) -> DataFrame:
    """PRECISION/RECALL/F1 threshold sweep (D99 — the operating-curve
    report of Davis & Goadrich 2006, "The Relationship Between
    Precision-Recall and ROC Curves": D96's AUC says whether the score
    RANKS well, D98's calibration whether the probabilities are
    honest; this says what you actually GET at each cutoff — the table
    a curator reads before picking the keep threshold).

    One row per threshold: ``(thr_micro, n_pred_pos, tp,
    precision_micro, recall_micro, f1_micro)`` with predictions
    ``score >= thr``. EVERYTHING is integer: counts, then
    ``precision = tp·1e6 div n_pred_pos`` (NULL when nothing
    predicted positive), ``recall = tp·1e6 div n_pos`` (NULL when no
    positives exist), ``f1 = 2·tp·1e6 div (n_pred_pos + n_pos)``
    (NULL when both are 0) — the algebraic F1 form that avoids
    dividing two quotients — so the sweep hash-adjudicates with no
    quantization recipe.

    Scale shape: the |thresholds|-row grid BROADCASTS onto the scored
    relation (a bounded ×|thresholds| expansion, the D87 pattern) and
    ONE map-side-combined aggregate reduces to |thresholds| rows; the
    positive total rides as a 1-row broadcast.
    """
    if not thresholds:
        raise ValueError("thresholds must be non-empty")
    spark = scored.sparkSession
    grid = spark.createDataFrame(
        [(int(t),) for t in sorted(thresholds)], "thr_micro bigint"
    )
    base = scored.select(
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("long").alias("_y"),
    )
    npos = base.agg(F.sum("_y").cast("long").alias("_npos"))
    per = (
        base.crossJoin(F.broadcast(grid))
        .groupBy("thr_micro")
        .agg(
            F.sum((F.col("_s") >= F.col("thr_micro")).cast("long"))
            .cast("long")
            .alias("n_pred_pos"),
            F.sum(
                ((F.col("_s") >= F.col("thr_micro")).cast("long"))
                * F.col("_y")
            )
            .cast("long")
            .alias("tp"),
        )
        .crossJoin(F.broadcast(npos))
    )
    return per.select(
        "thr_micro",
        "n_pred_pos",
        "tp",
        F.when(
            F.col("n_pred_pos") > 0,
            F.expr("(tp * 1000000) div n_pred_pos").cast("long"),
        ).alias("precision_micro"),
        F.when(
            F.col("_npos") > 0,
            F.expr("(tp * 1000000) div _npos").cast("long"),
        ).alias("recall_micro"),
        F.when(
            F.col("n_pred_pos") + F.col("_npos") > 0,
            F.expr("(2 * tp * 1000000) div (n_pred_pos + _npos)").cast(
                "long"
            ),
        ).alias("f1_micro"),
    )
