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
# to the NEXT round's rotation (head capacity is 50). EMPTY as of r7:
# the registration thaw put ALL 30 debuts (the former staged cohort)
# into the r7 head, so every registered query is either already
# driver-checked or scheduled this round. The ledger test fails if a
# query is neither checked, in the head, nor here; keep it empty by
# giving any NEW query a head slot in its debut round or listing it
# here explicitly. Current entries: the r7-added incremental near-dup
# pair (head capacity went to the 30 thawed debuts this round; these
# two take r8 head slots per the r8 plan below).
NEXT_ROUND_BACKLOG: tuple[str, ...] = (
    "dedup_jaccard_incremental",
    "dedup_minhash_incremental",
    "join_strategy",
    "join_bloom_prune",
    "join_interval",
    "privacy_kanon",
)

# Emitted verbatim at the end of ROTATION.md.
R7_PLAN = """\
## r7 rotation (executed)

The r6 freeze drained the adjudication backlog (every one of the 119
r6-registered queries has >=1 driver row across r1-r6), so r7 THAWED
registration: the 30 staged (query, oracle) pairs moved verbatim into
the registry (149 total) and every debut holds a head slot. Also in
the 50-slot head: `quality_report` (re-land after the oracle-side
HUGEINT->BIGINT cast — the one red r6 row), second-green slots for the
13 r6 first-timers, a third green for the once-FAILed `agg_salted`,
and second greens for five r5 first-greens (`dedup_embedding`,
`similarity_pairs`, `similarity_pairs_blocked`, `stream_rollup_batch`,
`text_stats`).

Head arithmetic: 1 re-land + 30 debuts + 13 second-greens + 1
`agg_salted` + 5 r5 second-greens = 50. Displaced: 24 thrice-proven
hash rows plus the six rows-only re-adjudications (each already
carries 1-2 driver rows-only rows and has no oracle to upgrade them) —
every displaced component stays guarded by the proven-component rule
in tests/test_registry.py.

Shape change at registration (VERDICT r6 ask #4): `events_anomaly`
registered as the REDUCE-FIRST volume variant
(operators/anomaly.window_count_anomaly — 6-hour tumbling counts per
event type, z-scored against the trailing 24 windows) instead of the
raw per-row z-score whose 5-value key made the whole event table sort
in 5 tasks. The raw `rolling_zscore` remains the operator for
high-cardinality keys, scale note in its docstring.

## r8 plan

All 155 registered queries except the six r8 debuts will have >=1
driver row once CORRECTNESS_r07 lands green. r8 head priorities, in
order:
1. Any r7 red rows (fix + re-land).
2. First re-greens for r7 debuts that landed rows-only or shaky.
3. Second green rows for the r7 debuts (the 30 never-checked-before
   queries should not rest on a single adjudication), rotating ~20 per
   round so every debut reaches 2 rows by r9.
4. Debut head slots for the r7-added incremental near-dup pair —
   `dedup_jaccard_incremental` (exact gram-index oracle) and
   `dedup_minhash_incremental` (band-store probe, rows-only) — and the
   r7-added D26 advisor/prune pair: `join_strategy` (exact decision
   oracle) and `join_bloom_prune` (exact: output is bit-identical to
   the plain join the oracle runs); plus the D27 `join_interval`
   debut (bucketized interval-overlap join, exact non-equi oracle)
   and the D28 `privacy_kanon` debut (k-anonymity suppression gate,
   exact window-count oracle).
5. Backfill third greens for r5/r6 first-timers as slots allow.
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
