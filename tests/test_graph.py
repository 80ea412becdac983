"""connected_components (operators/graph.py): fixpoint correctness on
known topologies, logarithmic convergence on a path, and the star-edge
builder's components-preserving contract."""

from __future__ import annotations

import pytest

from mysql2parquet_spark.operators.graph import (
    connected_components,
    gram_star_edges,
)


def _components(spark, edge_list, **kw):
    e = spark.createDataFrame(edge_list, "src long, dst long")
    rows = connected_components(e, **kw).collect()
    return {r["v"]: r["component"] for r in rows}


def test_two_disjoint_components(spark):
    got = _components(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cycle_collapses_to_min(spark):
    got = _components(spark, [(5, 6), (6, 7), (7, 5)])
    assert got == {5: 5, 6: 5, 7: 5}


def test_bridge_merges_two_stars(spark):
    # two star graphs joined by one bridge edge — a min-neighbor
    # forest would split them; the edge-propagation rounds must not
    edges = [(1, 2), (1, 3), (10, 11), (10, 12), (3, 10)]
    got = _components(spark, edges)
    assert set(got.values()) == {1}
    assert got[12] == 1 and got[11] == 1


def test_long_path_converges_within_rail(spark):
    # a 64-node path has diameter 63; naive propagation needs 63
    # rounds. Pointer doubling must land well inside max_iter=14
    # (~2*log2(64) + slack) — the rail RAISES on non-convergence, so
    # passing proves the round count, not just the answer
    edges = [(i, i + 1) for i in range(64)]
    got = _components(spark, edges, max_iter=14)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_duplicate_and_reversed_edges_are_harmless(spark):
    got = _components(spark, [(2, 1), (1, 2), (2, 1), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_isolated_nodes_absent_from_output(spark):
    # the operator labels nodes OF THE EDGE SET; callers keep isolated
    # nodes by unioning them back (documented contract)
    got = _components(spark, [(1, 2)])
    assert set(got) == {1, 2}


def test_non_convergence_raises(spark):
    e = [(i, i + 1) for i in range(32)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _components(spark, e, max_iter=1)


def test_gram_star_edges_match_pairwise_components(spark):
    # star edges must produce the SAME components as the full pairwise
    # shared-gram graph (the linear-edge-count contract)
    docs = [
        (1, "a b c d e f g h tail one"),
        (2, "a b c d e f g h tail two"),       # shares gram with 1
        (3, "x y z w v u t s other text"),
        (4, "x y z w v u t s other words"),    # shares gram with 3
        (5, "completely different text with no shared window at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    edges = gram_star_edges(df, k=8)
    got = {
        r["v"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}
    assert 5 not in got


def test_reliable_checkpoint_path(spark, tmp_path):
    # VERDICT r6 ask #5: with checkpoint_dir set, every round pins its
    # state through reliable checkpoint() files in the fault-tolerant
    # store (executor loss costs a re-read, not the job) — same answer,
    # and the directory must actually receive RDD checkpoint data.
    ckpt = str(tmp_path / "cc_ckpt")
    edges = [(1, 2), (2, 3), (10, 11), (3, 10), (20, 21)]
    got = _components(spark, edges, checkpoint_dir=ckpt)
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 20: 20, 21: 20}
    import pathlib

    written = list(pathlib.Path(ckpt).rglob("*"))
    assert written, "checkpoint_dir received no reliable checkpoint files"
