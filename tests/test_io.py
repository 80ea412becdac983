"""io-layer tests: format round-trips, schema-first reads, corrupt-row
visibility, single-file compat layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mysql2parquet_spark.io import (
    load_table,
    read_csv,
    read_json,
    write_clustered,
    write_csv,
    write_json,
    write_parquet,
)


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_csv")
    write_csv(nation, out)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType(), True),
            T.StructField("n_name", T.StringType(), True),
            T.StructField("n_regionkey", T.IntegerType(), True),
        ]
    )
    back = read_csv(spark, out, schema=schema)
    assert sorted(map(str, back.collect())) == sorted(map(str, nation.collect()))


def test_json_roundtrip(spark, sf_dir, tmp_path):
    region = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "region_json")
    write_json(region, out)
    back = read_json(spark, out)
    got = {(r.r_regionkey, r.r_name) for r in back.collect()}
    want = {(r.r_regionkey, r.r_name) for r in region.collect()}
    assert got == want


def test_csv_corrupt_rows_visible(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "data.csv").write_text("a,b\n1,2\nnot_an_int,3\n")
    schema = T.StructType(
        [
            T.StructField("a", T.IntegerType(), True),
            T.StructField("b", T.IntegerType(), True),
            T.StructField("_corrupt_record", T.StringType(), True),
        ]
    )
    df = read_csv(spark, str(p), schema=schema).cache()
    assert df.count() == 2
    bad = df.filter("_corrupt_record IS NOT NULL").collect()
    assert len(bad) == 1 and "not_an_int" in bad[0]._corrupt_record
    df.unpersist()


def test_single_file_compat_layout(spark, sf_dir, tmp_path):
    import os

    region = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "single")
    write_parquet(region, out, single_file=True)
    # reference writes exactly one literal FILE (main.go:165), not a dir
    assert os.path.isfile(out)
    assert spark.read.parquet(out).count() == region.count()


def test_single_file_honors_mode(spark, sf_dir, tmp_path):
    """single_file must respect the writer mode for the FINAL path, not
    just the temp dir: 'error' raises on an existing file, 'ignore'
    leaves it untouched, 'append' is rejected (a single parquet file
    cannot be appended), and the temp dir never survives."""
    import os

    import pytest as _pytest

    region = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "single")
    write_parquet(region, out, single_file=True)
    before = os.path.getmtime(out)

    with _pytest.raises(FileExistsError):
        write_parquet(region, out, single_file=True, mode="error")
    with _pytest.raises(ValueError, match="append"):
        write_parquet(region, out, single_file=True, mode="append")
    write_parquet(region.limit(1), out, single_file=True, mode="ignore")
    assert os.path.getmtime(out) == before  # untouched
    assert spark.read.parquet(out).count() == region.count()
    assert not os.path.exists(out + "._single_tmp")  # tmp cleaned up


def test_export_appends_parquet_suffix(spark, sf_dir, tmp_path):
    """Naming parity: the reference appends '.parquet' to the flag value
    unconditionally (main.go:165), even when it already ends in it."""
    import os

    from mysql2parquet_spark.compat import export

    region = load_table(spark, sf_dir, "region")
    flag_value = str(tmp_path / "users.parquet")
    export(region, flag_value, single_file=True)
    assert os.path.isfile(flag_value + ".parquet")  # users.parquet.parquet


def test_write_clustered_files_own_disjoint_sorted_ranges(spark, sf_dir, tmp_path):
    """Range-clustered layout: every output file owns a disjoint
    o_orderdate range (so parquet min/max stats prune whole files for
    date predicates), no rows are lost, and rows are sorted within each
    file."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_clustered")
    write_clustered(orders, out, cluster_by="o_orderdate", n_files=8)

    back = spark.read.parquet(out)
    assert back.count() == orders.count()

    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("o_orderdate").alias("lo"),
            F.max("o_orderdate").alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert len(per_file) > 1  # genuinely split
    ranges = sorted((r.lo, r.hi) for r in per_file)
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert lo_a <= hi_a
        assert hi_a <= lo_b  # disjoint (boundary date may touch)

    # a narrow date slice must be answerable from a strict subset of files
    lo_file_dates = sorted(r.lo for r in per_file)
    probe = lo_file_dates[len(lo_file_dates) // 2]
    touched = (
        back.filter(F.col("o_orderdate") == probe)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert touched < len(per_file)


def test_read_parquet_merges_evolved_schema(spark, sf_dir, tmp_path):
    """Schema evolution: a column added mid-lifetime unions in with
    merge_schema=True (old files read NULL there); the default read
    stays cheap and single-footer."""
    from pyspark.sql import functions as F

    from mysql2parquet_spark.io import read_parquet

    region = load_table(spark, sf_dir, "region")
    out = str(tmp_path / "evolved")
    region.write.parquet(out)  # v1 files: no extra column
    region.withColumn("ingest_batch", F.lit(7)).write.mode("append").parquet(
        out
    )  # v2 files add a column

    merged = read_parquet(spark, out, merge_schema=True)
    assert "ingest_batch" in merged.columns
    assert merged.count() == 2 * region.count()
    nulls = merged.filter(F.col("ingest_batch").isNull()).count()
    sevens = merged.filter(F.col("ingest_batch") == 7).count()
    assert nulls == region.count() and sevens == region.count()


def test_compact_parquet_shrinks_file_count(spark, sf_dir, tmp_path):
    """Compaction rewrites a fragmented directory into the byte-derived
    target file count without losing rows, and refuses to clobber an
    existing destination."""
    import glob

    import pytest as _pytest

    from mysql2parquet_spark.io import compact_parquet

    li = load_table(spark, sf_dir, "lineitem")
    frag = str(tmp_path / "fragmented")
    li.repartition(16).write.parquet(frag)
    assert len(glob.glob(frag + "/part-*.parquet")) == 16

    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, frag, out, target_file_mb=128)
    assert n >= 1
    files = glob.glob(out + "/part-*.parquet")
    assert len(files) == n < 16
    assert spark.read.parquet(out).count() == li.count()

    with _pytest.raises(Exception):
        compact_parquet(spark, frag, out)  # mode='error': no clobber


# --------------------------------------------------------------------------
# Versioned snapshots (write-audit-publish)
# --------------------------------------------------------------------------

def test_snapshot_publish_and_latest(spark, tmp_path):
    from mysql2parquet_spark.io import (
        latest_snapshot,
        publish_snapshot,
        snapshot_versions,
    )

    root = str(tmp_path / "snaps")
    df0 = spark.createDataFrame([(1, "a")], "k bigint, v string")
    p0 = publish_snapshot(df0, root)
    assert p0.endswith("v=0")
    p1 = publish_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"), root
    )
    assert p1.endswith("v=1")
    assert latest_snapshot(spark, root) == p1
    assert snapshot_versions(spark, root) == {0: True, 1: True}

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="no committed snapshot"):
        latest_snapshot(spark, str(tmp_path / "nothing"))


def test_snapshot_crashed_partial_version_is_skipped(spark, tmp_path):
    """A version dir without _SUCCESS (crashed mid-write) must be
    invisible to readers, and the next publish must NOT reuse its
    number."""
    import os

    from mysql2parquet_spark.io import (
        latest_snapshot,
        publish_snapshot,
        snapshot_versions,
    )

    root = str(tmp_path / "snaps2")
    p0 = publish_snapshot(
        spark.createDataFrame([(1, "a")], "k bigint, v string"), root
    )
    # simulate a crash: v=1 exists but never committed
    partial = os.path.join(root, "v=1")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-zzz.parquet"), "wb") as fh:
        fh.write(b"garbage")

    assert snapshot_versions(spark, root) == {0: True, 1: False}
    assert latest_snapshot(spark, root) == p0  # reader never sees v=1
    p2 = publish_snapshot(
        spark.createDataFrame([(2, "b")], "k bigint, v string"), root
    )
    assert p2.endswith("v=2")  # crashed number not reused
    assert latest_snapshot(spark, root) == p2


def test_fold_cdc_snapshot_end_to_end(spark, tmp_path):
    from mysql2parquet_spark.io import fold_cdc_snapshot, latest_snapshot, publish_snapshot

    root = str(tmp_path / "snaps3")
    publish_snapshot(
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k bigint, v string"
        ),
        root,
    )
    events = spark.createDataFrame(
        [(2, None, "D", 1), (3, "c", "I", 2)],
        "k bigint, v string, op string, seq bigint",
    )
    p = fold_cdc_snapshot(spark, root, events, ["k"])
    assert p == latest_snapshot(spark, root)
    got = {(r.k, r.v) for r in spark.read.parquet(p).collect()}
    assert got == {(1, "a"), (3, "c")}


def test_publish_claim_blocks_concurrent_publisher(spark, tmp_path):
    """Interleaved publishers, both targeting v=1: A enumerates versions,
    then B claims v=1 (atomic createNewFile) before A does. A's
    createNewFile must lose, A fails loudly, and A writes NO v=1
    directory — never two writers committing into one version dir. A's
    retry (fresh enumeration sees B's claim) targets the next number.

    The race window is between enumeration and the claim, so B's claim
    is planted while A's view is pinned stale via monkeypatching the
    claim enumeration — a claim already visible at enumeration time is
    simply skipped (self-healing), which the retry half also proves.
    """
    import os
    from unittest import mock

    import pytest as _pytest

    import mysql2parquet_spark.io as mio
    from mysql2parquet_spark.io import (
        latest_snapshot,
        publish_snapshot,
        snapshot_versions,
    )

    root = str(tmp_path / "snaps_race")
    publish_snapshot(
        spark.createDataFrame([(1, "a")], "k bigint, v string"), root
    )
    # B wins the claim on v=1 after A's (stale, empty) enumeration.
    with open(os.path.join(root, "v=1.claim"), "x"):
        pass
    with mock.patch.object(mio, "_claimed_versions", return_value=set()):
        with _pytest.raises(RuntimeError, match="concurrent publisher"):
            publish_snapshot(
                spark.createDataFrame([(2, "b")], "k bigint, v string"),
                root,
            )
    assert snapshot_versions(spark, root) == {0: True}  # no partial v=1
    # Retry with a fresh view: B's claim counts as taken → v=2.
    p2 = publish_snapshot(
        spark.createDataFrame([(2, "b")], "k bigint, v string"), root
    )
    assert p2.endswith("v=2")
    assert latest_snapshot(spark, root) == p2


def test_vacuum_keeps_newest_n_and_claims(spark, tmp_path):
    import os

    from mysql2parquet_spark.io import (
        latest_snapshot,
        publish_snapshot,
        snapshot_versions,
        vacuum_snapshots,
    )

    root = str(tmp_path / "snaps_vac")
    for i in range(4):
        publish_snapshot(
            spark.createDataFrame([(i, "x")], "k bigint, v string"), root
        )
    deleted = vacuum_snapshots(spark, root, keep=2)
    assert deleted == [0, 1]
    assert snapshot_versions(spark, root) == {2: True, 3: True}
    assert latest_snapshot(spark, root).endswith("v=3")
    # claim sentinels of vacuumed versions are swept with them
    assert not os.path.exists(os.path.join(root, "v=0.claim"))
    assert not os.path.exists(os.path.join(root, "v=1.claim"))
    assert os.path.exists(os.path.join(root, "v=3.claim"))
    # keep=1 leaves only the latest
    assert vacuum_snapshots(spark, root, keep=1) == [2]
    assert snapshot_versions(spark, root) == {3: True}


def test_vacuum_never_touches_latest_or_uncommitted(spark, tmp_path):
    import os

    import pytest as _pytest

    from mysql2parquet_spark.io import (
        publish_snapshot,
        snapshot_versions,
        vacuum_snapshots,
    )

    root = str(tmp_path / "snaps_vac2")
    # refusal: root with no committed version (uncommitted-only layout)
    os.makedirs(os.path.join(root, "v=0"))
    with open(os.path.join(root, "v=0", "part-xxx.parquet"), "wb") as fh:
        fh.write(b"garbage")
    with _pytest.raises(FileNotFoundError, match="refusing to vacuum"):
        vacuum_snapshots(spark, root, keep=1)

    # keep < 1 is invalid — the latest is never deletable
    with _pytest.raises(ValueError, match="keep must be >= 1"):
        vacuum_snapshots(spark, root, keep=0)

    root2 = str(tmp_path / "snaps_vac3")
    for i in range(3):
        publish_snapshot(
            spark.createDataFrame([(i, "x")], "k bigint, v string"), root2
        )
    # an uncommitted (in-flight/crashed) dir below the cut survives vacuum
    os.remove(os.path.join(root2, "v=1", "_SUCCESS"))
    deleted = vacuum_snapshots(spark, root2, keep=1)
    assert deleted == [0]
    assert snapshot_versions(spark, root2) == {1: False, 2: True}

    # single committed version: vacuum is a no-op, never deletes latest
    root3 = str(tmp_path / "snaps_vac4")
    publish_snapshot(
        spark.createDataFrame([(1, "x")], "k bigint, v string"), root3
    )
    assert vacuum_snapshots(spark, root3, keep=1) == []
    assert snapshot_versions(spark, root3) == {0: True}


def test_load_tables_skips_empty_but_propagates_corrupt(spark, tmp_path):
    """ADVICE r4: an empty stray *.parquet entry is skipped quietly, but
    a corrupt footer on a table with real bytes must raise the parquet
    error itself — not surface later as TABLE_OR_VIEW_NOT_FOUND."""
    import os

    import pytest as _pytest

    from mysql2parquet_spark.io import load_tables

    d = tmp_path / "tables"
    os.makedirs(d / "empty_table.parquet")  # empty dir — skip
    spark.createDataFrame([(1,)], "k bigint").write.parquet(
        str(d / "good.parquet")
    )
    dfs = load_tables(spark, str(d))
    assert set(dfs) == {"good"}

    with open(d / "corrupt.parquet", "wb") as fh:
        fh.write(b"this is not parquet at all")
    with _pytest.raises(Exception) as ei:
        load_tables(spark, str(d))
    assert "TABLE_OR_VIEW_NOT_FOUND" not in str(ei.value)


def test_snapshot_publish_partitioned_and_pruned(spark, tmp_path):
    """partition_by gives every version a hive layout: _SUCCESS still
    lands at the version root (commit contract unchanged), values
    round-trip, and a partition-key filter prunes at read (the reason
    to partition a snapshot at all)."""
    import os

    from mysql2parquet_spark.io import (
        fold_cdc_snapshot,
        latest_snapshot,
        publish_snapshot,
        snapshot_versions,
    )

    root = str(tmp_path / "snapsP")
    df = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "fr"), (3, "c", "en")],
        "k bigint, v string, lang string",
    )
    p0 = publish_snapshot(df, root, partition_by=["lang"])
    assert os.path.isdir(os.path.join(p0, "lang=en"))
    assert os.path.isdir(os.path.join(p0, "lang=fr"))
    assert snapshot_versions(spark, root) == {0: True}

    back = spark.read.parquet(latest_snapshot(spark, root))
    assert {(r.k, r.v, r.lang) for r in back.collect()} == {
        (1, "a", "en"), (2, "b", "fr"), (3, "c", "en")
    }
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = (
        back.filter(back.lang == "en")
        ._jdf.queryExecution()
        .explainString(jmode)
    )
    assert "PartitionFilters: [isnotnull(lang" in plan, plan

    # a CDC fold carries the layout forward
    events = spark.createDataFrame(
        [(2, None, None, "D", 1), (4, "d", "zh", "I", 2)],
        "k bigint, v string, lang string, op string, seq bigint",
    )
    p1 = fold_cdc_snapshot(spark, root, events, ["k"], partition_by=["lang"])
    assert os.path.isdir(os.path.join(p1, "lang=zh"))
    got = {(r.k, r.v, r.lang) for r in spark.read.parquet(p1).collect()}
    assert got == {(1, "a", "en"), (3, "c", "en"), (4, "d", "zh")}


def test_write_zordered_prunes_on_both_columns(spark, sf_dir, tmp_path):
    """Z-order vs 1-D clustering: with files laid out on the Morton key
    of (o_custkey, o_totalprice), file-level min/max stats prune for
    predicates on EITHER column; the 1-D layout on o_custkey alone
    cannot prune a price-only predicate."""
    import glob

    from pyspark.sql import functions as F

    from mysql2parquet_spark.io import write_zordered

    orders = load_table(spark, sf_dir, "orders")
    n_files = 8
    zpath = str(tmp_path / "orders_z")
    write_zordered(
        orders, zpath, ["o_custkey", "o_totalprice"], n_files=n_files
    )
    assert len(glob.glob(zpath + "/part-*.parquet")) == n_files
    assert "_zkey" not in spark.read.parquet(zpath).columns

    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()

    lo_ck, hi_ck, lo_tp, hi_tp = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).collect()[0]

    def touched(df, pred):
        return (
            df.filter(pred)
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )

    ck_band = F.col("o_custkey") <= lo_ck + (hi_ck - lo_ck) * 0.10
    tp_band = F.col("o_totalprice") <= lo_tp + (hi_tp - lo_tp) * 0.10
    assert touched(back, ck_band) < n_files
    assert touched(back, tp_band) < n_files

    # 1-D clustering on custkey: the price-only predicate hits every file
    from mysql2parquet_spark.io import write_clustered

    cpath = str(tmp_path / "orders_c")
    write_clustered(orders, cpath, cluster_by="o_custkey", n_files=n_files)
    cback = spark.read.parquet(cpath)
    assert touched(cback, ck_band) < n_files  # its own column prunes
    assert touched(cback, tp_band) == n_files  # the other cannot


def test_write_zordered_dates_and_validation(spark, sf_dir, tmp_path):
    import pytest as _pytest

    from mysql2parquet_spark.io import write_zordered

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_zd")
    write_zordered(orders, out, ["o_orderdate", "o_custkey"], n_files=4)
    assert spark.read.parquet(out).count() == orders.count()

    with _pytest.raises(ValueError, match=">=2 cluster columns"):
        write_zordered(orders, str(tmp_path / "x"), ["o_custkey"])
    with _pytest.raises(ValueError, match="exceeds 62"):
        write_zordered(
            orders, str(tmp_path / "y"),
            ["o_custkey", "o_totalprice"], bits=32,
        )
    with _pytest.raises(ValueError, match="unsupported type"):
        write_zordered(
            orders, str(tmp_path / "z"), ["o_orderstatus", "o_custkey"]
        )


# ---------------------------------------------------------------- ingest


def _corpus_schema():
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    return StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )


def test_parse_corpus_jsonl_flags_malformed(spark, tmp_path):
    from mysql2parquet_spark.io import parse_corpus

    src = tmp_path / "landing"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en"}\n'
        "not json at all\n"
        "\n"  # blank line: dropped, not quarantined
        '{"doc_id": "NaN-ish", "text": "bad type", "lang": "en"}\n'
        '{"doc_id": 2, "text": "welt", "lang": "de"}\n'
    )
    out = parse_corpus(spark, str(src), _corpus_schema()).orderBy("_raw")
    rows = out.collect()  # bounded-metadata: 4-line fixture
    assert len(rows) == 4  # blank line gone
    by_corrupt = {r["_raw"]: r["_corrupt"] for r in rows}
    assert by_corrupt["not json at all"] is True
    assert by_corrupt['{"doc_id": 1, "text": "hello", "lang": "en"}'] is False
    # type-coercion failure is corrupt, not silently nulled
    assert by_corrupt['{"doc_id": "NaN-ish", "text": "bad type", "lang": "en"}'] is True
    good = {r["doc_id"]: r["lang"] for r in rows if not r["_corrupt"]}
    assert good == {1: "en", 2: "de"}
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "text", "lang", "_raw", "_corrupt",
    ]
    assert out.schema["doc_id"].dataType.simpleString() == "bigint"


def test_parse_corpus_csv_arity_and_types(spark, tmp_path):
    from mysql2parquet_spark.io import parse_corpus

    src = tmp_path / "landing"
    src.mkdir()
    (src / "part.csv").write_text(
        "1|alpha|en\n"
        "zz|beta|de\n"  # bad bigint
        "3|gamma|fr|EXTRA\n"  # wrong arity
        "4|delta|es\n"
    )
    out = parse_corpus(
        spark, str(src), _corpus_schema(), fmt="csv", delimiter="|"
    )
    rows = out.collect()  # bounded-metadata: 4-line fixture
    corrupt = sorted(r["_raw"] for r in rows if r["_corrupt"])
    assert corrupt == ["3|gamma|fr|EXTRA", "zz|beta|de"]
    good = sorted(r["doc_id"] for r in rows if not r["_corrupt"])
    assert good == [1, 4]


def test_parse_corpus_validation(spark, tmp_path):
    import pytest

    from pyspark.sql.types import StringType, StructField, StructType

    from mysql2parquet_spark.io import parse_corpus

    with pytest.raises(ValueError, match="jsonl|csv"):
        parse_corpus(spark, str(tmp_path), _corpus_schema(), fmt="xml")
    clash = StructType([StructField("_cr", StringType())])
    with pytest.raises(ValueError, match="_cr is reserved"):
        parse_corpus(spark, str(tmp_path), clash)


def test_parse_corpus_is_scan_side_only(spark, tmp_path):
    """The good/bad split must stay a projection+filter over the text
    scan — an Exchange here would shuffle the whole landing dir."""
    from mysql2parquet_spark.io import parse_corpus

    src = tmp_path / "landing"
    src.mkdir()
    (src / "a.jsonl").write_text('{"doc_id": 1, "text": "t", "lang": "en"}\n')
    df = parse_corpus(spark, str(src), _corpus_schema())
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p, p


def test_ingest_corpus_quarantine_roundtrip(spark, tmp_path):
    from mysql2parquet_spark.io import ingest_corpus

    src = tmp_path / "landing"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en"}\n'
        "BROKEN LINE\n"
        '{"doc_id": 2, "text": "welt", "lang": "de"}\n'
        '{"doc_id": 3, "text": "salut", "lang": "fr"}\n'
    )
    dest = tmp_path / "typed"
    q = tmp_path / "quarantine"
    stats = ingest_corpus(
        spark, str(src), str(dest), _corpus_schema(),
        quarantine_dir=str(q), partition_by=["lang"],
    )
    assert stats == {"good": 3, "quarantined": 1}
    typed = spark.read.parquet(str(dest))
    assert sorted(r["doc_id"] for r in typed.collect()) == [1, 2, 3]
    assert "_corrupt" not in typed.columns and "_raw" not in typed.columns
    # hive partitioning materialized (lang read back from dir structure)
    langs = {d.name for d in dest.iterdir() if d.is_dir()}
    assert {"lang=en", "lang=de", "lang=fr"} <= langs
    # quarantined raw line preserved verbatim for replay
    replay = spark.read.text(str(q)).collect()
    assert [r["value"] for r in replay] == ["BROKEN LINE"]


# ---------------------------------------------------------------------------
# Bucketed tables — the co-located-join layout (io.write_bucketed)
# ---------------------------------------------------------------------------


@pytest.fixture
def bucketed_pair(spark, sf_dir, tmp_path):
    """orders + customer bucketed 8 ways on the join key, registered as
    external tables under tmp_path; dropped (metadata only) after."""
    from mysql2parquet_spark.io import load_table, write_bucketed

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    write_bucketed(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        "bt_orders",
        bucket_by="o_custkey",
        num_buckets=8,
        sort_by="o_custkey",
        path=str(tmp_path / "bt_orders"),
    )
    write_bucketed(
        c.select("c_custkey", "c_name"),
        "bt_customer",
        bucket_by="c_custkey",
        num_buckets=8,
        sort_by="c_custkey",
        path=str(tmp_path / "bt_customer"),
    )
    yield
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_customer")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_pair):
    """Same keys + same bucket count on both sides: the sort-merge join
    runs straight off the bucketed files — ZERO Exchange in the plan.
    The write-time shuffle amortizes over every later join; this is the
    co-location contract 100 TB fact-to-fact joins rely on."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bt_orders").join(
            spark.table("bt_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "SortMergeJoin" in plan
        # and the result is still correct vs a plain-parquet join
        from mysql2parquet_spark.io import load_table

        expected = (
            load_table(spark, sf_dir, "orders")
            .join(
                load_table(spark, sf_dir, "customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .count()
        )
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key reuses the bucketing as its
    distribution — no shuffle at all."""
    agg = (
        spark.table("bt_orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bare_path_read_loses_bucketing(spark, tmp_path, bucketed_pair):
    """The documented catalog caveat: reading the same files WITHOUT the
    catalog (spark.read.parquet) sees plain parquet — the groupBy
    shuffles again. Pins that the no-Exchange plans above really come
    from the bucket metadata, not plan luck."""
    bare = spark.read.parquet(str(tmp_path / "bt_orders"))
    agg = bare.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_write_bucketed_validates_inputs(spark):
    from mysql2parquet_spark.io import write_bucketed

    df = spark.range(5).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="bucket columns not in"):
        write_bucketed(df, "t_bad", bucket_by="nope", num_buckets=4)
    with pytest.raises(ValueError, match="num_buckets"):
        write_bucketed(df, "t_bad", bucket_by="k", num_buckets=0)


# ---------------------------------------------------------------------------
# Snapshot time-travel reads + keyed version diff
# ---------------------------------------------------------------------------


def _publish(spark, root, rows):
    from mysql2parquet_spark.io import publish_snapshot

    df = spark.createDataFrame(rows, "k bigint, name string, bal double")
    return publish_snapshot(df, root)


def test_read_snapshot_time_travel(spark, tmp_path):
    from mysql2parquet_spark.io import read_snapshot

    root = str(tmp_path / "snap")
    _publish(spark, root, [(1, "a", 1.0)])
    _publish(spark, root, [(1, "a2", 1.5), (2, "b", 2.0)])
    latest = {r.k for r in read_snapshot(spark, root).collect()}
    v0 = {r.k for r in read_snapshot(spark, root, version=0).collect()}
    assert latest == {1, 2} and v0 == {1}
    with pytest.raises(FileNotFoundError, match="no snapshot"):
        read_snapshot(spark, root, version=7)


def test_read_snapshot_refuses_uncommitted(spark, tmp_path):
    import os

    from mysql2parquet_spark.io import read_snapshot

    root = str(tmp_path / "snap")
    _publish(spark, root, [(1, "a", 1.0)])
    os.remove(os.path.join(root, "v=0", "_SUCCESS"))
    with pytest.raises(FileNotFoundError, match="uncommitted"):
        read_snapshot(spark, root, version=0)


def test_snapshot_diff_classifies_iud(spark, tmp_path):
    from mysql2parquet_spark.io import snapshot_diff

    root = str(tmp_path / "snap")
    _publish(
        spark,
        root,
        [(1, "keep", 1.0), (2, "upd", 2.0), (3, "del", 3.0), (4, None, 4.0)],
    )
    _publish(
        spark,
        root,
        [(1, "keep", 1.0), (2, "UPD", 2.5), (4, None, 4.0), (5, "new", 5.0)],
    )
    got = {
        (r.change, r.k): (r.name, r.bal)
        for r in snapshot_diff(spark, root, 0, 1, ["k"]).collect()
    }
    # unchanged keys 1 and 4 (4 has a NULL value column — null-safe
    # comparison must call it unchanged) are absent
    assert got == {
        ("U", 2): ("UPD", 2.5),  # updates carry NEW values
        ("D", 3): ("del", 3.0),  # deletes carry the last-seen OLD values
        ("I", 5): ("new", 5.0),
    }


def test_snapshot_diff_same_version_is_empty(spark, tmp_path):
    from mysql2parquet_spark.io import snapshot_diff

    root = str(tmp_path / "snap")
    _publish(spark, root, [(1, "a", 1.0), (2, "b", 2.0)])
    assert snapshot_diff(spark, root, 0, 0, ["k"]).count() == 0


def test_snapshot_diff_validates(spark, tmp_path):
    from mysql2parquet_spark.io import snapshot_diff

    root = str(tmp_path / "snap")
    _publish(spark, root, [(1, "a", 1.0)])
    with pytest.raises(ValueError, match="at least one key"):
        snapshot_diff(spark, root, 0, 0, [])
    with pytest.raises(ValueError, match="missing from snapshots"):
        snapshot_diff(spark, root, 0, 0, ["nope"])


def test_snapshot_diff_rejects_reserved_names(spark, tmp_path):
    from mysql2parquet_spark.io import publish_snapshot, snapshot_diff

    root = str(tmp_path / "snap")
    publish_snapshot(
        spark.createDataFrame([(1, "x")], "k bigint, change string"), root
    )
    with pytest.raises(ValueError, match="collide"):
        snapshot_diff(spark, root, 0, 0, ["k"])
