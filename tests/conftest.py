from __future__ import annotations

import os

import pytest

SF_TEST_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from mysql2parquet_spark.session import get_spark

    s = get_spark("mysql2parquet_spark-tests", master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]"), shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_TEST_DIR


def target_feeds_anti_directly(plan_text: str) -> bool:
    """True iff some LeftAnti join's left branch reaches a parquet scan
    through narrow nodes only (Project/Filter/columnar glue) — i.e. the
    merge target is scanned straight into the broadcast anti-join with
    no Exchange/Sort interposed. Textual but structural: an exchanged
    target would print Exchange/Sort lines between the join and its
    scan. Use with mode='simple' explain output (formatted mode hides
    operator arguments, making substring asserts vacuous)."""
    lines = plan_text.splitlines()
    for i, ln in enumerate(lines):
        if "LeftAnti" not in ln:
            continue
        # walk down the left branch while the nodes stay narrow — no
        # fixed window, so a deeper Project/Filter chain still matches
        for nxt in lines[i + 1 :]:
            if "FileScan parquet" in nxt:
                return True
            if not any(
                o in nxt for o in ("Project", "Filter", "ColumnarToRow")
            ):
                break  # Exchange, Sort, another join, RDD scan, ...
    return False


@pytest.fixture(scope="session")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()
