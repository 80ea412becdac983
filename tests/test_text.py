"""Text-operator unit tests: tokenizers, rolling hashes, winnowing
fingerprints (determinism + edit robustness), lang-ID argmax."""

from __future__ import annotations

from pyspark.sql import functions as F

from mysql2parquet_spark.operators import text


def _one(spark, s: str, col):
    df = spark.createDataFrame([(s,)], "text: string")
    return df.select(col.alias("out")).first().out


def test_regex_tokens_bpe_ish(spark):
    got = _one(spark, "Hello, world42! x", text.regex_tokens("text"))
    assert got == ["Hello", ",", "world", "42", "!", "x"]


def test_rolling_hashes_shift_invariant(spark):
    """The same k-gram must hash identically wherever it appears."""
    h1 = _one(spark, "abcdefgh", text.rolling_hashes("text", k=8))
    h2 = _one(spark, "XYZabcdefgh", text.rolling_hashes("text", k=8))
    assert len(h1) == 1
    assert h1[0] in h2  # the 'abcdefgh' gram reappears with equal hash


def test_winnow_deterministic_and_edit_robust(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    edited = base.replace("lazy", "hazy", 1)
    f_base = _one(spark, base, text.winnow_fingerprints("text"))
    f_base2 = _one(spark, base, text.winnow_fingerprints("text"))
    f_edit = _one(spark, edited, text.winnow_fingerprints("text"))
    assert f_base == f_base2  # deterministic
    inter = len(set(f_base) & set(f_edit))
    union = len(set(f_base) | set(f_edit))
    assert inter / union > 0.6  # one edit keeps most fingerprints
    f_other = _one(spark, "zzz completely different text qqq " * 5,
                   text.winnow_fingerprints("text"))
    assert len(set(f_base) & set(f_other)) / len(set(f_base)) < 0.2


def test_winnow_short_text(spark):
    # shorter than k chars -> no grams -> empty fingerprint set
    assert _one(spark, "abc", text.winnow_fingerprints("text", k=8)) == []


def test_lang_pred_argmax(spark):
    rows = [
        ("the cat sat on the mat and it is a cat",),   # en stopwords
        ("el gato es un gato y la casa es de el",),     # es stopwords
        ("xx yy zz qq ww",),                            # no stopwords
    ]
    df = spark.createDataFrame(rows, "text: string")
    got = [r.lang_pred for r in text.with_lang_scores(df).collect()]
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "und"


def test_repetition_score_orders_planted_docs(spark):
    """A degenerate loop doc scores near 1, a fully-unique doc scores 0
    (and hashes as +0.0, not -0.0); the op is a pure projection."""
    from mysql2parquet_spark.operators.text import with_repetition_score

    df = spark.createDataFrame(
        [
            (1, "spam " * 50),           # one distinct 2-gram
            (2, " ".join(f"w{i}" for i in range(50))),  # all unique
        ],
        "doc_id: long, text: string",
    )
    out = {r.doc_id: r for r in with_repetition_score(df).collect()}
    assert out[1].rep_ratio > 0.95
    assert out[2].rep_ratio == 0.0
    assert str(out[2].rep_ratio) == "0.0"  # -0.0 guard
    plan = (
        with_repetition_score(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_normalize_text_idempotent_and_canonical(spark):
    from mysql2parquet_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [("Customer#000000042",), ("  A!  B?? c  ",), ("already clean",)],
        "s: string",
    )
    once = [r.n for r in df.select(normalize_text("s").alias("n")).collect()]
    assert once == ["customer000000042", "a b c", "already clean"]
    twice = [
        r.n
        for r in df.select(normalize_text(normalize_text("s")).alias("n")).collect()
    ]
    assert twice == once  # idempotent


def test_bm25_ranks_planted_relevance(spark):
    """More query-term mass => higher score; docs without any query term
    are absent; a rarer term outweighs a common one at equal tf/dl."""
    from mysql2parquet_spark.operators.text import bm25_scores

    filler = " ".join(f"f{i}" for i in range(20))
    rows = [
        (1, "apple apple apple " + filler),   # heavy on 'apple'
        (2, "apple " + filler),               # light on 'apple'
        (3, filler),                          # no query terms
    ]
    # 'banana' appears in only one doc -> rarer than 'apple' (two docs)
    rows.append((4, "banana " + filler))
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: r.bm25 for r in bm25_scores(df, ["apple", "banana"]).collect()}
    assert 3 not in got
    assert got[1] > got[2] > 0
    assert got[4] > got[2]  # same tf=1, same dl: rarer term scores higher


# --------------------------------------------------------------------------
# PII redaction (with_pii_redaction)
# --------------------------------------------------------------------------

PII_DOC = (
    "Reach me at alice@example.com or bob.smith+x@corp.co.uk, "
    "server 10.0.0.1, cell 555-123-4567, card 4111-1111-1111-1111."
)


def _redact(spark, s: str):
    df = spark.createDataFrame([(1, s)], "doc_id int, text string")
    return text.with_pii_redaction(df).first()


def test_pii_counts_and_placeholders(spark):
    r = _redact(spark, PII_DOC)
    assert (r.n_email, r.n_ipv4, r.n_phone, r.n_card) == (2, 1, 1, 1)
    red = r.redacted
    for ph in ("<EMAIL>", "<IP>", "<PHONE>", "<CARD>"):
        assert ph in red
    assert "alice@example.com" not in red
    assert "10.0.0.1" not in red
    assert "555-123-4567" not in red
    assert "4111-1111-1111-1111" not in red


def test_pii_redaction_idempotent(spark):
    """Placeholders contain no digits or '@' — redacting twice is the
    identity on already-redacted text."""
    once = _redact(spark, PII_DOC).redacted
    twice = _redact(spark, once)
    assert twice.redacted == once
    assert (twice.n_email, twice.n_ipv4, twice.n_phone, twice.n_card) == (
        0, 0, 0, 0,
    )


def test_pii_clean_text_untouched(spark):
    clean = "No secrets here, just words and a year 2024."
    r = _redact(spark, clean)
    assert r.redacted == clean
    assert (r.n_email, r.n_ipv4, r.n_phone, r.n_card) == (0, 0, 0, 0)


def test_pii_card_not_double_counted_as_phone(spark):
    """The card's digit groups must not also match the phone pattern
    (boundary anchors prevent it) — counts stay orthogonal."""
    r = _redact(spark, "pay 4111-1111-1111-1111 now")
    assert (r.n_phone, r.n_card) == (0, 1)


def test_pii_requires_patterns(spark):
    import pytest

    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError, match="at least one pattern"):
        text.with_pii_redaction(df, patterns=[])


# ---------------------------------------------------------------------------
# fuzzy_pairs — blocked record linkage
# ---------------------------------------------------------------------------


def test_fuzzy_pairs_semantics_and_blocking(spark):
    from mysql2parquet_spark.operators.text import fuzzy_pairs

    rows = [
        (1, "smith", "a"),
        (2, "smyth", "a"),   # distance 1, same block
        (3, "smith", "b"),   # identical text but DIFFERENT block: never pairs
        (4, "jones", "a"),   # distance > 2 from smith/smyth
        (5, "smiths", "a"),  # distance 1 from smith, 2 from smyth
    ]
    df = spark.createDataFrame(rows, "id bigint, name string, blk string")
    got = {
        (r.key_a, r.key_b, r.distance)
        for r in fuzzy_pairs(
            df, "id", "name", max_distance=2, block_cols=["blk"]
        ).collect()
    }
    assert got == {(1, 2, 1), (1, 5, 1), (2, 5, 2)}


def test_fuzzy_pairs_requires_blocking_and_plan_is_equi_join(spark):
    import pytest as _pytest

    from mysql2parquet_spark.operators.text import fuzzy_pairs

    df = spark.createDataFrame([(1, "a", "x")], "id bigint, name string, blk string")
    with _pytest.raises(ValueError, match="O\\(n²\\)|blocking"):
        fuzzy_pairs(df, "id", "name", max_distance=1)
    plan = (
        fuzzy_pairs(df, "id", "name", max_distance=1, block_cols=["blk"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_fuzzy_pairs_computed_block_expr(spark):
    """block_expr: a normalized prefix as the blocking key."""
    from pyspark.sql import functions as F

    from mysql2parquet_spark.operators.text import fuzzy_pairs

    rows = [(1, "Smith"), (2, "smyth"), (3, "Zeta")]
    df = spark.createDataFrame(rows, "id bigint, name string")
    got = {
        (r.key_a, r.key_b)
        for r in fuzzy_pairs(
            df,
            "id",
            "name",
            max_distance=2,
            block_expr=F.substring(F.lower("name"), 1, 2),
        ).collect()
    }
    assert got == {(1, 2)}  # 'sm' block; Zeta blocks alone


def test_fuzzy_pairs_equals_brute_force_within_blocks(spark):
    """Property: for ANY small corpus, fuzzy_pairs returns exactly the
    brute-force pair set {(a,b): same block, a<b, lev(a,b)<=k} — the
    blocking changes WHICH pairs are candidates, never the verdict on
    a candidate."""
    import itertools

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from mysql2parquet_spark.operators.text import fuzzy_pairs

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(
        names=st.lists(
            st.tuples(
                st.text(alphabet="abc", min_size=0, max_size=5),
                st.sampled_from("xy"),
            ),
            min_size=1,
            max_size=10,
        ),
        k=st.integers(min_value=0, max_value=3),
    )
    def check(names, k):
        rows = [(i, t, blk) for i, (t, blk) in enumerate(names)]
        df = spark.createDataFrame(rows, "id bigint, name string, blk string")
        got = {
            (r.key_a, r.key_b, r.distance)
            for r in fuzzy_pairs(
                df, "id", "name", max_distance=k, block_cols=["blk"]
            ).collect()
        }
        want = {
            (i, j, lev(a, b))
            for (i, (a, ba)), (j, (b, bb)) in itertools.combinations(
                enumerate(names), 2
            )
            if ba == bb and lev(a, b) <= k
        }
        assert got == want

    check()


# --- term_cooccurrence_pmi --------------------------------------------------


def test_pmi_planted_collocation(spark):
    from math import log

    from mysql2parquet_spark.operators.text import term_cooccurrence_pmi

    # alpha+beta always co-occur (4 docs); gamma appears alone in 4 more;
    # filler pads N so pmi(alpha,beta) = ln(N * 4 / (4 * 4)) exactly.
    rows = [(i, "alpha beta filler") for i in range(4)]
    rows += [(i + 4, "gamma filler") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = term_cooccurrence_pmi(
        df, text_col="text", id_col="doc_id", top_n=10, min_pairs=2
    ).collect()
    got = {(r.t1, r.t2): r for r in out}
    ab = got[("alpha", "beta")]
    assert ab.c_ab == 4
    assert abs(ab.pmi - round(log(8 * 4 / (4 * 4)), 6)) < 1e-9
    # filler co-occurs with everything — pmi below the planted pair
    assert got[("alpha", "filler")].pmi < ab.pmi
    # gamma never meets alpha/beta: no pair row at all
    assert ("alpha", "gamma") not in got and ("beta", "gamma") not in got


def test_pmi_canonical_order_and_top_n_bound(spark):
    from mysql2parquet_spark.operators.text import term_cooccurrence_pmi

    rows = [(i, "zz aa mm") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = term_cooccurrence_pmi(
        df, text_col="text", id_col="doc_id", top_n=2, min_pairs=1
    ).collect()
    # only 2 terms admitted (tie on df=5 breaks by term asc: aa, mm) and
    # every pair is emitted once with t1 < t2
    assert [(r.t1, r.t2) for r in out] == [("aa", "mm")]


# --- duplicated_window_counts (exact-substring dedup) ----------------------


def test_duplicated_windows_planted_span(spark):
    from mysql2parquet_spark.operators.dedup import duplicated_window_counts

    shared = "one two three four"  # 4 tokens -> one 4-token window
    rows = [
        (1, shared + " uniq1a uniq1b"),
        (2, shared + " uniq2a uniq2b"),
        (3, "totally different words here now"),
        (4, "short doc"),  # < k tokens: zero windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in duplicated_window_counts(
            df, text_col="text", id_col="doc_id", k=4
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # 6 tokens, k=4 -> 3 windows each; only the leading shared window dups
    assert out[1].n_windows == 3 and out[1].dup_windows == 1
    assert out[2].n_windows == 3 and out[2].dup_windows == 1
    assert out[3].dup_windows == 0
    assert out[4].n_windows == 0 and out[4].dup_windows == 0
    assert out[4].dup_ratio is None  # 0/0 stays NULL, never fabricated
    assert abs(out[1].dup_ratio - round(1 / 3, 6)) < 1e-9


def test_duplicated_windows_within_doc_repeat_not_cross_doc(spark):
    from mysql2parquet_spark.operators.dedup import duplicated_window_counts

    # the same gram twice in ONE doc is intra-doc repetition
    # (with_repetition_score territory), not cross-doc duplication
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "c d e f")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in duplicated_window_counts(
            df, text_col="text", id_col="doc_id", k=2
        ).collect()
    }
    assert out[1].dup_windows == 0 and out[2].dup_windows == 0


def test_duplicated_windows_counts_every_position(spark):
    from mysql2parquet_spark.operators.dedup import duplicated_window_counts

    # doc 1 contains the shared bigram at TWO positions; once the gram is
    # cross-doc duplicated, both positions count toward the span cut
    df = spark.createDataFrame(
        [(1, "x y z x y"), (2, "x y tail words")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in duplicated_window_counts(
            df, text_col="text", id_col="doc_id", k=2
        ).collect()
    }
    assert out[1].dup_windows == 2  # positions 1 and 4
    assert out[2].dup_windows == 1
