"""Named correctness queries — the engine's declared capability surface.

Each entry pairs a Spark implementation (DataFrame-first; Catalyst owns
the physical plan) with a DuckDB-runnable ANSI-SQL oracle. The driver runs
both at sf0.01 and compares row-count + schema + order-insensitive
value-hash, so every query follows the determinism rules of SURVEY.md §2.2:
ROUND(double_agg, 2), unique-key tie-breaks under LIMIT, and identical
aliases on both sides. Approximate / non-SQL-expressible ops omit the
oracle (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL, or None for rows-only checks
    doc: str


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return wrap


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {n: q.fn for n, q in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {n: q.oracle for n, q in REGISTRY.items() if q.oracle is not None}


_loaded = False


def _load() -> None:
    """Import every query module exactly once (they self-register)."""
    global _loaded
    if _loaded:
        return
    from mysql2parquet_spark.queries import (  # noqa: F401
        advanced,
        relext,
        streaming_batch,
        tierb,
        tierc,
        tpch,
    )

    _loaded = True
