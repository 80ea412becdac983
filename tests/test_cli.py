"""CLI contract tests (reference flag surface, main.go:58-85) — flag
validation in-process; the end-to-end export path runs via --tables-dir
(no MySQL server needed)."""

from __future__ import annotations

import subprocess
import sys

from mysql2parquet_spark.cli import _split_session_prelude, build_parser, main


def test_version_exits_zero(capsys):
    assert main(["--version"]) == 0
    assert capsys.readouterr().out.strip()


def test_missing_required_flags_exit_one(capsys):
    assert main([]) == 1
    err = capsys.readouterr().err
    assert "--query" in err and "--parquet" in err


def test_mysql_mode_requires_credentials(capsys):
    rc = main(["--query", "SELECT 1", "--parquet", "/tmp/x"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "--password" in err and "--database" in err


def test_session_prelude_split():
    prelude, q = _split_session_prelude(
        "SET TRANSACTION ISOLATION LEVEL READ UNCOMMITTED; "
        "SET SQL_BIG_SELECTS=1; SELECT * FROM t"
    )
    assert "READ UNCOMMITTED" in prelude and "SQL_BIG_SELECTS" in prelude
    assert q == "SELECT * FROM t"
    assert _split_session_prelude("SELECT 1") == (None, "SELECT 1")


def test_defaults_match_reference():
    args = build_parser().parse_args(["--query", "q", "--parquet", "p"])
    assert args.user == "root"          # main.go:59
    assert args.host == "127.0.0.1"     # main.go:61
    assert args.port == 3306            # main.go:62


def test_end_to_end_tables_dir(tmp_path, sf_dir):
    """Full subprocess run: SQL over parquet tables -> parquet output."""
    out = tmp_path / "out"
    rc = subprocess.run(
        [
            sys.executable,
            "-m",
            "mysql2parquet_spark.cli",
            "--tables-dir",
            sf_dir,
            "--query",
            "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY 1",
            "--parquet",
            str(out),
            "--single-file",
            "--master",
            "local[2]",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert rc.returncode == 0, rc.stderr[-2000:]
    import duckdb

    # --single-file reproduces the reference layout AND naming: ONE
    # literal file at <flag>.parquet (main.go:165 appends the suffix).
    import os

    assert os.path.isfile(f"{out}.parquet")
    n = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{out}.parquet')"
    ).fetchone()[0]
    assert n == 3


def test_merge_into_requires_keys_and_distinct_paths(capsys, tmp_path):
    rc = main(
        ["--tables-dir", "/x", "--query", "q", "--parquet", "/tmp/o",
         "--merge-into", "/tmp/snap"]
    )
    assert rc == 1
    assert "--merge-keys" in capsys.readouterr().err

    rc = main(
        ["--tables-dir", "/x", "--query", "q", "--parquet", "/tmp/snap",
         "--merge-into", "/tmp/snap", "--merge-keys", "k"]
    )
    assert rc == 1
    assert "write-audit-publish" in capsys.readouterr().err

    rc = main(
        ["--tables-dir", "/x", "--query", "q", "--parquet", "/tmp/o",
         "--merge-into", "/tmp/snap", "--merge-keys", "k",
         "--cdc-op-column", "op"]
    )
    assert rc == 1
    assert "--cdc-seq-column" in capsys.readouterr().err


def test_end_to_end_incremental_merge(tmp_path, spark, sf_dir):
    """The reference's nightly job, incrementally: snapshot v0 from a
    full export, then a delta query merged in via --merge-into; the new
    snapshot equals full re-export of the changed table."""
    snap0 = str(tmp_path / "snap0")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    ).write.parquet(snap0)
    # delta lives in a parquet "table" dir the CLI can query
    tables = tmp_path / "tables"
    tables.mkdir()
    spark.createDataFrame(
        [(2, "B"), (9, "Z")], "k bigint, v string"
    ).write.parquet(str(tables / "delta.parquet"))

    out = tmp_path / "snap1"
    rc = subprocess.run(
        [
            sys.executable, "-m", "mysql2parquet_spark.cli",
            "--tables-dir", str(tables),
            "--query", "SELECT k, v FROM delta",
            "--merge-into", snap0,
            "--merge-keys", "k",
            "--parquet", str(out),
            "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert rc.returncode == 0, rc.stderr[-2000:]
    got = {(r.k, r.v) for r in spark.read.parquet(str(out)).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (9, "Z")}


def test_end_to_end_cdc_merge(tmp_path, spark):
    """CLI CDC mode: raw I/U/D events with a sequence column folded into
    the snapshot — delete-then-reinsert within the batch survives as the
    reinsert; the stale pre-delete update loses."""
    snap0 = str(tmp_path / "snap0")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    ).write.parquet(snap0)
    tables = tmp_path / "tables"
    tables.mkdir()
    spark.createDataFrame(
        [
            (2, None, "D", 10),
            (2, "reborn", "I", 11),
            (3, "stale", "U", 5),
            (3, None, "D", 12),
            (9, "new", "I", 13),
        ],
        "k bigint, v string, op string, seq bigint",
    ).write.parquet(str(tables / "cdc.parquet"))

    out = tmp_path / "snap1"
    rc = subprocess.run(
        [
            sys.executable, "-m", "mysql2parquet_spark.cli",
            "--tables-dir", str(tables),
            "--query", "SELECT k, v, op, seq FROM cdc",
            "--merge-into", snap0,
            "--merge-keys", "k",
            "--cdc-op-column", "op",
            "--cdc-seq-column", "seq",
            "--parquet", str(out),
            "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert rc.returncode == 0, rc.stderr[-2000:]
    got = {(r.k, r.v) for r in spark.read.parquet(str(out)).collect()}
    assert got == {(1, "a"), (2, "reborn"), (9, "new")}


def test_missing_tables_dir_clean_error(tmp_path):
    """A missing --tables-dir must fail with the clean query-error path
    (rc=2), not a FileNotFoundError traceback (review finding)."""
    rc = subprocess.run(
        [
            sys.executable, "-m", "mysql2parquet_spark.cli",
            "--tables-dir", str(tmp_path / "nonexistent"),
            "--query", "SELECT 1 FROM lineitem",
            "--parquet", str(tmp_path / "o"),
            "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert rc.returncode == 2, rc.stderr[-1500:]
    assert "query error:" in rc.stderr
    assert "FileNotFoundError" not in rc.stderr


def test_stray_entries_in_tables_dir_skipped(tmp_path, spark):
    """Unreadable *.parquet entries (empty dir) and non-identifier stems
    must be skipped, not abort registration."""
    from mysql2parquet_spark.io import load_tables

    tables = tmp_path / "t"
    tables.mkdir()
    (tables / "empty.parquet").mkdir()          # unreadable: no footer
    (tables / "bad-name.parquet").mkdir()       # non-identifier stem
    spark.createDataFrame([(1,)], "x bigint").write.parquet(
        str(tables / "good.parquet")
    )
    got = load_tables(spark, str(tables))
    assert list(got) == ["good"]


def test_cdc_flags_require_merge_into(capsys):
    rc = main(
        ["--tables-dir", "/x", "--query", "q", "--parquet", "/tmp/o",
         "--cdc-op-column", "op", "--cdc-seq-column", "seq"]
    )
    assert rc == 1
    assert "require(s) --merge-into" in capsys.readouterr().err


def test_merge_path_guard_survives_aliases(capsys, tmp_path):
    """'/x//snap' vs '/x/snap' (and ./ aliases) must still trip the
    write-audit-publish guard — a raw string compare would pass and the
    overwrite export would destroy the snapshot being read."""
    snap = str(tmp_path / "snap")
    rc = main(
        ["--tables-dir", "/x", "--query", "q",
         "--merge-into", snap, "--merge-keys", "k",
         "--parquet", str(tmp_path) + "//snap"]
    )
    assert rc == 1
    assert "write-audit-publish" in capsys.readouterr().err


def test_merge_blank_keys_and_missing_snapshot_clean_errors(capsys, tmp_path):
    rc = main(
        ["--tables-dir", "/x", "--query", "q", "--parquet", "/tmp/o",
         "--merge-into", "/tmp/snapX", "--merge-keys", " , "]
    )
    assert rc == 1
    assert "at least one column" in capsys.readouterr().err


def test_snapshot_root_bootstrap_then_fold(tmp_path, spark):
    """--snapshot-root lifecycle: first run bootstraps v=0 from the
    query; second run folds a delta into it and publishes v=1; readers
    pin the latest committed version throughout."""
    from mysql2parquet_spark.io import latest_snapshot

    tables = tmp_path / "tables"
    tables.mkdir()
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "k bigint, v string"
    ).write.parquet(str(tables / "full.parquet"))
    spark.createDataFrame(
        [(2, "B"), (9, "Z")], "k bigint, v string"
    ).write.parquet(str(tables / "delta.parquet"))

    root = str(tmp_path / "root")

    def run(query, *extra):
        return subprocess.run(
            [
                sys.executable, "-m", "mysql2parquet_spark.cli",
                "--tables-dir", str(tables),
                "--query", query,
                "--snapshot-root", root,
                "--master", "local[2]",
                *extra,
            ],
            capture_output=True, text=True, timeout=300,
        )

    r0 = run("SELECT k, v FROM full")
    assert r0.returncode == 0, r0.stderr[-2000:]
    assert r0.stdout.strip().endswith("v=0")

    r1 = run("SELECT k, v FROM delta", "--merge-keys", "k")
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert r1.stdout.strip().endswith("v=1")

    latest = latest_snapshot(spark, root)
    got = {(r.k, r.v) for r in spark.read.parquet(latest).collect()}
    assert got == {(1, "a"), (2, "B"), (9, "Z")}


def test_snapshot_root_rejects_parquet_flag(capsys):
    rc = main(
        ["--tables-dir", "/x", "--query", "q",
         "--snapshot-root", "/tmp/r", "--parquet", "/tmp/o"]
    )
    assert rc == 1
    assert "replaces --parquet" in capsys.readouterr().err


def test_snapshot_root_validation_gaps_closed(capsys):
    """Review findings: CDC bootstrap, merge-dependent flags without
    --merge-keys, and --compat/--single-file must all fail loudly in
    snapshot-root mode instead of publishing something wrong."""
    rc = main(
        ["--tables-dir", "/x", "--query", "q",
         "--snapshot-root", "/tmp/r", "--order-column", "seq"]
    )
    assert rc == 1
    assert "require(s) --merge-keys" in capsys.readouterr().err

    rc = main(
        ["--tables-dir", "/x", "--query", "q",
         "--snapshot-root", "/tmp/r", "--compat"]
    )
    assert rc == 1
    assert "not supported with" in capsys.readouterr().err


def test_snapshot_root_refuses_cdc_bootstrap(tmp_path, spark):
    """A fresh root + CDC flags must NOT publish raw events as v=0."""
    tables = tmp_path / "tables"
    tables.mkdir()
    spark.createDataFrame(
        [(1, "x", "I", 1)], "k bigint, v string, op string, seq bigint"
    ).write.parquet(str(tables / "cdc.parquet"))
    root = tmp_path / "freshroot"
    rc = subprocess.run(
        [
            sys.executable, "-m", "mysql2parquet_spark.cli",
            "--tables-dir", str(tables),
            "--query", "SELECT * FROM cdc",
            "--snapshot-root", str(root),
            "--merge-keys", "k",
            "--cdc-op-column", "op", "--cdc-seq-column", "seq",
            "--master", "local[2]",
        ],
        capture_output=True, text=True, timeout=300,
    )
    assert rc.returncode == 2, rc.stderr[-1500:]
    assert "cannot bootstrap" in rc.stderr
    assert not (root / "v=0").exists()  # nothing published
