"""Driver simulation: exercises __spark_entry__.py exactly as the
external harness does — a VANILLA SparkSession (none of our engine
defaults), entry() smoke at sf0.001, then every queries() entry vs its
oracle_sql() on DuckDB at sf0.01 with an order-insensitive value hash.

The value compare is TYPE-STRICT (VERDICT r5 "What's wrong" #2): it
uses the same ``mysql2parquet_spark.canon`` canonicalizer as the local
mirror test, so a Decimal-vs-float output-shape drift that the real
driver hash-FAILs (the agg_salted class) fails here too instead of
slipping through a ``str()`` round-trip. A planted agg_salted-shape
fixture is self-checked at startup so a future canonicalizer
regression makes the sim refuse to run rather than go blind.

Usage: python scripts/driver_sim.py [sf_dir] [query_name ...]
(naming queries restricts the sweep to that subset — the full run is
the adjudication artifact; the subset form is the edit-loop tool)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysql2parquet_spark.canon import (  # noqa: E402
    canon,
    column_type_classes,
    fetch_oracle_arrow,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def _self_check_strictness():
    """The exact agg_salted r4 failure: bit-identical money values, one
    side Decimal, the other float. A stringifying canon passes this;
    the driver does not — the sim must not either."""
    from decimal import Decimal

    spark_like = [("F", Decimal("1233170551.74"))]
    oracle_like = [("F", 1233170551.74)]
    cols = ["o_orderstatus", "total"]
    assert canon(spark_like, cols) != canon(oracle_like, cols), (
        "driver_sim canonicalizer is not type-strict — Decimal vs float "
        "compared equal (the r4 agg_salted blindness); refusing to run"
    )
    assert canon([(5,)], ["v"]) != canon([(5.0,)], ["v"])


def main():
    _self_check_strictness()
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    # Vanilla session — deliberately NOT mysql2parquet_spark.session.
    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    t0 = time.time()
    df = entrymod.entry(spark)
    n = df.count()
    print(f"entry(): {n} rows, schema={df.schema.simpleString()} "
          f"({time.time() - t0:.1f}s)")
    assert n > 0

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    passed = failed = rows_only = 0
    for name in sorted(qs):
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {str(e)[:150]}")
            failed += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({dt:.1f}s)")
            rows_only += 1
            continue
        # Arrow fetch — the driver's coercion path (HUGEINT→Decimal visible,
        # not silently int-coerced as fetchall() does; quality_report r6).
        dcols, drows = fetch_oracle_arrow(con, oracles[name])
        ok_cols = sorted(scols) == sorted(dcols)
        ok_cnt = len(srows) == len(drows)
        ok_vals = canon(srows, scols) == canon(drows, dcols) if ok_cols and ok_cnt else False
        if ok_cols and ok_cnt and ok_vals:
            print(f"PASS {name}: {len(srows)} rows ({dt:.1f}s)")
            passed += 1
        else:
            print(f"FAIL {name}: cols={ok_cols} cnt={ok_cnt}({len(srows)}/{len(drows)}) vals={ok_vals}")
            if ok_cols and ok_cnt:
                st = column_type_classes(srows, scols)
                ot = column_type_classes(drows, dcols)
                for c in scols:
                    if st[c] != ot[c]:
                        print(f"    type drift {c}: spark={sorted(st[c])} "
                              f"duck={sorted(ot[c])}")
                sc, dc = canon(srows, scols), canon(drows, dcols)
                diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                for a, b in diffs:
                    print(f"    spark={a}\n    duck ={b}")
            failed += 1
    print(f"\nTOTAL: {passed} pass, {rows_only} rows-only, {failed} fail "
          f"of {len(qs)}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
