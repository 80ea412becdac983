"""Deterministic R-fold replication of an sf directory for SCALING
PROBES (VERDICT r14 ask #7): at sf0.1 every query is 0.3-3 s and
dominated by fixed driver/plan/codegen overhead, so 8-core vs 32-core
ratios measure nothing about operator parallelism. This script builds
an sf0.4-shaped dataset (default R=4) from sf0.1 so the staged set can
be re-timed at two core counts on a compute-dominated input.

Construction (pure pyarrow, no Spark, no randomness):
- region/nation copy unchanged (fixed dims).
- Every other table is R replicas concatenated; replica k shifts every
  KEY column by k*OFFSET (OFFSET=10_000_000 > any sf0.1 key), so keys
  stay unique AND referential joins keep their exact sf0.1 selectivity
  (replica k of lineitem joins replica k of orders/part/supplier).
- documents: replica k>0 additionally prefixes the text with a replica
  token ("rdup<k> ") so md5/minhash dedup does not collapse the corpus
  to 1/R (which would starve every downstream text operator of rows).
- All column types round-trip through pyarrow unchanged (events.ts
  stays TIMESTAMP(NANOS) — the engine's legacy-nanos read path needs
  the original physical type).

This data is MEASUREMENT INFRASTRUCTURE only: bench.py never reads it
unless $SPARK_GRAFT_SF_DIR points at it explicitly, and nothing is
derived from /root/testdata at query time. Output dir must not exist.

Usage: python scripts/gen_scaled_probe_data.py SRC_DIR DST_DIR [R]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 10_000_000

KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

COPY_ONLY = ("region", "nation")


def replicate(src: str, dst: str, r: int) -> None:
    os.makedirs(dst, exist_ok=False)
    for name in COPY_ONLY:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: copied {t.num_rows} rows")
    for name, keys in KEY_COLS.items():
        p = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(p):
            continue
        t = pq.read_table(p)
        reps = []
        for k in range(r):
            rep = t
            if k > 0:
                for col in keys:
                    i = rep.schema.get_field_index(col)
                    typ = rep.schema.field(i).type
                    shifted = pc.cast(
                        pc.add(rep.column(col), k * OFFSET), typ
                    )
                    rep = rep.set_column(i, rep.schema.field(i), shifted)
                if name == "documents":
                    i = rep.schema.get_field_index("text")
                    typ = rep.schema.field(i).type
                    prefixed = pc.cast(
                        pc.binary_join_element_wise(
                            f"rdup{k}", rep.column("text"), " "
                        ),
                        typ,
                    )
                    rep = rep.set_column(
                        i, rep.schema.field(i), prefixed
                    )
            reps.append(rep)
        out = pa.concat_tables(reps)
        pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
        print(f"{name}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    replicate(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 4)
