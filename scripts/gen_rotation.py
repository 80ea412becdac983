"""Generate ROTATION.md — the driver-head rotation ledger.

The external driver hash-checks only the first 50 registered queries per
round; with ~100 registered, head slots rotate so every oracled query
gets external adjudication within a few rounds (VERDICT r3 ask #3). This
ledger is GENERATED from the per-round CORRECTNESS_r*.json files plus
the current DRIVER_PRIORITY, so the rotation history is auditable at a
glance instead of living in comment blocks. Regenerate after each
round's CORRECTNESS file lands:

    python scripts/gen_rotation.py        # rewrites ROTATION.md

tests/test_registry.py::test_rotation_ledger_current asserts the
committed file matches a fresh render, and that every query not yet
driver-checked either sits in the current head (checked this round) or
in the declared next-round backlog.
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Queries that have never held a head slot and are deliberately deferred
# to the NEXT round's rotation (head capacity is 50). EMPTY as of r6: all
# 16 r5 registrations hold head slots this round, draining the backlog —
# every registered query has (or is getting) >=1 driver adjudication, and
# new registration is frozen (test_no_new_queries_while_backlog). The
# ledger test fails if a query is neither checked, in the head, nor here;
# keep it empty by giving any NEW query a head slot in its debut round or
# listing it here explicitly.
NEXT_ROUND_BACKLOG: tuple[str, ...] = ()

# Emitted verbatim at the end of ROTATION.md: what r7 should register
# once CORRECTNESS_r06 lands. Everything named here already exists as a
# fully-oracled entry in queries/staged.py, parity-gated by
# tests/test_staged_queries.py at sf0.001 AND sf0.01 — registration is
# a mechanical move of STAGED entries into REGISTRY + head slots.
R7_PLAN = """\
## r7 registration plan (deferred by the r6 freeze)

New query registration was frozen in r6 so the 16-query adjudication
backlog could drain (all 16 are in the r6 head). The r6 operator
additions are STAGED as full (query, oracle) pairs in
`queries/staged.py` — locally parity-checked with the driver-strict
canonicalizer (`tests/test_staged_queries.py`, green at sf0.001 and
sf0.01). Once CORRECTNESS_r06 lands green, move the STAGED entries
into the registry and give them head slots:

- `drift_psi` — PSI/JS/TV drift report between two event slices
  (operators/drift.py over histogram sketches + categorical counts).
- `skew_profile` — heavy-hitter/salt-factor report on lineitem's join
  key (operators/scale.key_skew_profile).
- `sketch_kmv_overlap` — KMV Jaccard/intersection between two user
  sets vs an exact DuckDB set-algebra oracle (exact-path k).
- `sketch_bloom_probe` — Bloom membership probe vs an exact join
  oracle (no false negatives; fp-free at test geometry).
- `sample_split_group` — group-disjoint train/val/test split by source
  (operators/scale.assign_split) vs the same md5-band logic in SQL.
- `tpch_q4_shape` / `tpch_q14_shape` / `tpch_q19_shape` — EXISTS
  semi-join count, conditional-aggregate ratio, disjunctive-predicate
  join (queries/staged.py, fixture-adapted).
- `events_anomaly` — rolling z-score outlier flags per event type
  (operators/anomaly.py; exclude-own-row baseline, min-history gate).
- `join_explosion` — exact pre-join cardinality / explosion check from
  the two count tables (operators/scale.join_explosion_estimate).
- `tpch_q13_shape` / `tpch_q16_shape` / `tpch_q21_shape` /
  `tpch_q22_shape` — the remaining distinct TPC-H optimizer shapes:
  agg-of-agg over a LEFT join, NOT IN + count-distinct,
  double-correlated EXISTS/NOT EXISTS (semi+anti with residual
  inequality), scalar-subquery filter + anti join.
- `dedup_substring` — exact repeated 8-token-window profile per doc
  (operators/dedup.duplicated_window_counts; sixth dedup family).
- `text_pmi` — top-40-term document co-occurrence PMI
  (operators/text.term_cooccurrence_pmi).
- `events_transitions` — per-user first-order Markov transition matrix
  with row-normalized probabilities.
- `knn_classify` — k=5 cosine k-NN majority-label prediction for a
  bounded query set (full deterministic oracle).
- `events_resample` — gap-filled hourly LOCF resample per event type
  (operators/timeseries.resample_locf).
- `events_ohlc` — daily open/high/low/close downsample per event type
  (operators/timeseries.ohlc).
- `tpch_q2_shape` / `q7` / `q8` / `q9` / `q11` / `q12` / `q15` /
  `q17` / `q20` — the rest of the 22-query TPC-H suite,
  fixture-adapted where partsupp/shipmode don't exist (correlated
  MIN decorrelated to group-and-join-back, dual-role nation joins
  with a cross-pair OR residual, the 7-relation q8 tree, per-part
  value vs own-global-total HAVING, conditional pivot counts,
  view+MAX scalar equality on exact decimals, correlated AVG,
  nested IN chain as stacked semi-joins). With these staged, every
  distinct optimizer shape in TPC-H has a fully-oracled entry.
- `dedup_cluster_cc` — duplicate-cluster connected components over the
  shared-8-token-window graph (operators/graph.py: min-label
  propagation + pointer doubling, O(log diameter) rounds, fixpoint
  termination) vs a recursive-CTE transitive-closure oracle — the
  iterative-graph family's first hash-checked entry (the MinHash CC
  variant is approximate by construction, rows-only).

Adjudication-readiness evidence beyond the parity gate: all staged
queries produced bit-identical canonical outputs at sf0.01 across
cluster shapes (local[2] / 3 shuffle partitions vs local[16] / 64 —
the verify-skill determinism probe), and the set carries its own plan
pins in tests/test_staged_queries.py (LeftSemi for the EXISTS shape,
equi-key extraction under the q19 disjunction, single-shuffle anomaly
window, no broadcast hints on linearly-growing sides).
"""


def _round_files() -> dict[int, dict]:
    out = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rn = int(os.path.basename(f).split("_r")[1].split(".")[0])
        with open(f) as fh:
            out[rn] = json.load(fh)
    return out


def _cell(rec: dict) -> str:
    if rec.get("hash_match"):
        return "hash"
    if rec.get("err") == "no_oracle":
        return "rows"
    if rec.get("err"):
        return "ERROR"
    return "FAIL"


def render() -> str:
    import sys

    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from mysql2parquet_spark.queries import DRIVER_PRIORITY, REGISTRY, _load

    _load()
    rounds = _round_files()
    rns = sorted(rounds)
    head = set(DRIVER_PRIORITY)

    lines = [
        "# ROTATION — driver-head adjudication ledger",
        "",
        "Generated by `python scripts/gen_rotation.py` from "
        "`CORRECTNESS_r*.json` + the current `DRIVER_PRIORITY`. "
        "Cells: `hash` = full value-hash match, `rows` = rows-only by "
        "design (no oracle), `ERROR`/`FAIL` = red driver row, blank = "
        "not in that round's 50-slot window.",
        "",
        "| query | " + " | ".join(f"r{rn}" for rn in rns) + " | in current head |",
        "| --- | " + " | ".join("---" for _ in rns) + " | --- |",
    ]
    never_checked = []
    for name in sorted(REGISTRY):
        cells = [
            _cell(rounds[rn][name]) if name in rounds[rn] else ""
            for rn in rns
        ]
        if not any(cells):
            never_checked.append(name)
        lines.append(
            f"| {name} | " + " | ".join(cells) + " | "
            + ("yes" if name in head else "") + " |"
        )
    lines += [
        "",
        f"**Never driver-checked ({len(never_checked)}):** "
        + (", ".join(never_checked) if never_checked else "none")
        + ".",
        "",
        "Of these, scheduled in the CURRENT head (adjudicated this round): "
        + (", ".join(sorted(n for n in never_checked if n in head)) or "none")
        + ". Deferred to next round's rotation: "
        + (", ".join(sorted(n for n in never_checked if n not in head)) or "none")
        + ".",
        "",
        R7_PLAN,
    ]
    return "\n".join(lines)


def main() -> None:
    out = os.path.join(REPO, "ROTATION.md")
    with open(out, "w") as fh:
        fh.write(render())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
