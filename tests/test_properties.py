"""Property-based tests (hypothesis): invariants that hold for ANY data,
not just the fixtures. Example counts are small — every example is a
Spark job — but each example carries many generated rows."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from mysql2parquet_spark.compat import reference_type_projection
from mysql2parquet_spark.operators.dedup import exact_dedup

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

money = st.decimals(
    min_value=Decimal("-99999.99"),
    max_value=Decimal("99999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)


@given(vals=st.lists(money, min_size=1, max_size=200))
@settings(**SETTINGS)
def test_decimal_sum_is_exact(spark, vals):
    """dsum (decimal aggregation) equals exact Decimal arithmetic for any
    2-dp inputs, under any partitioning."""
    df = spark.createDataFrame(
        [(float(v),) for v in vals], "x: double"
    ).repartition(7)
    got = df.agg(
        F.sum(F.col("x").cast("decimal(18,2)")).cast("double").alias("s")
    ).first().s
    want = float(sum(vals))
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 20),  # key
            st.integers(0, 10**6),  # id
            st.text(max_size=8),
        ),
        min_size=1,
        max_size=100,
    )
)
@settings(**SETTINGS)
def test_exact_dedup_properties(spark, rows):
    """exact_dedup: one row per key, survivor has the minimum id, output
    rows all existed in the input."""
    rows = [(k, i, t) for (k, i, t) in rows]
    df = spark.createDataFrame(rows, "k: int, id: long, payload: string")
    out = exact_dedup(df, ["k"], "id").collect()
    by_key = {}
    for k, i, t in rows:
        if k not in by_key or i < by_key[k][0]:
            by_key[k] = (i, t)
    # unique keys, count matches distinct keys
    assert len(out) == len(by_key)
    assert len({r.k for r in out}) == len(out)
    for r in out:
        assert r.id == by_key[r.k][0]
        assert (r.k, r.id, r.payload) in set(rows)


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-128, 127)),
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
            st.one_of(st.none(), st.text(max_size=10)),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**SETTINGS)
def test_compat_projection_properties(spark, rows):
    """Reference compat projection: row count preserved; string outputs
    never null (NULL→'' quirk, main.go:183-184); numeric nulls kept."""
    df = spark.createDataFrame(
        rows, "c_int: int, c_float: float, c_str: string"
    )
    out = reference_type_projection(df).collect()
    assert len(out) == len(rows)
    got_strs = [r.c_str for r in out] + [r.c_float for r in out]
    assert all(v is not None for v in got_strs)
    assert sum(r.c_int is None for r in out) == sum(i is None for i, _, _ in rows)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=60,
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_winnow_never_errors_and_deterministic(spark, texts):
    """Winnowing fingerprints: total (no errors on any printable input,
    including empty/short strings) and deterministic."""
    from mysql2parquet_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame([(t,) for t in texts], "text: string")
    a = [r.fp for r in df.select(winnow_fingerprints("text").alias("fp")).collect()]
    b = [r.fp for r in df.select(winnow_fingerprints("text").alias("fp")).collect()]
    assert a == b
    for t, fp in zip(texts, a, strict=True):
        if len(t) < 8:
            assert fp == []
        else:
            assert len(fp) >= 1


@given(
    toks=st.lists(st.integers(1, 900), min_size=1, max_size=120),
    budget=st.sampled_from([64, 512]),
)
@settings(**SETTINGS)
def test_pack_sequences_matches_python_reference(spark, toks, budget):
    """For ANY doc-length multiset, the distributed packer reproduces the
    sequential greedy reference per shard: bin = running-start // budget,
    over docs in id order."""
    from mysql2parquet_spark.operators.pipeline import pack_sequences

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string").repartition(5)
    got = {
        r.doc_id: (r.shard, r.n_toks, r.bin)
        for r in pack_sequences(df, budget=budget, n_shards=3).collect()
    }
    starts = {0: 0, 1: 0, 2: 0}
    for i, n in enumerate(toks):
        shard = i % 3
        assert got[i] == (shard, n, starts[shard] // budget), (i, n)
        starts[shard] += n


@given(
    vec=st.lists(
        st.floats(
            min_value=-1e3,
            max_value=1e3,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=64,
    )
)
@settings(**SETTINGS)
def test_quantize_int8_properties(spark, vec):
    """For ANY float vector: values bounded by 127, the max-|x| element
    saturates exactly, dequantization error is within half a quantum,
    and all-zero vectors map to zeros."""
    from mysql2parquet_spark.functions.vector import quantize_int8

    df = spark.createDataFrame([(vec,)], "embedding: array<float>")
    q = df.select(quantize_int8("embedding").alias("q")).first().q
    import struct

    f32 = [struct.unpack("f", struct.pack("f", x))[0] for x in vec]
    s = max(abs(x) for x in f32)
    assert len(q) == len(vec)
    if s == 0:
        assert q == [0] * len(vec)
        return
    assert max(abs(v) for v in q) == 127
    for x, qi in zip(f32, q):
        assert abs(qi) <= 127
        assert abs(x - qi * s / 127.0) <= s / 127.0 * 0.5 + 1e-9
