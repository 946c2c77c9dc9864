"""Query catalog backing the driver contract (__spark_entry__.py).

Every operator from SURVEY.md §2 registers here as a named query
(``(spark, sf_dir) → DataFrame``) plus, when SQL-expressible, an exact
ANSI-SQL oracle that DuckDB runs on the same parquet tables. Column
names and numeric types are aligned on BOTH sides (the driver's compare
hashes values after sorting columns by name), and floating-point
outputs are rounded in-query on both sides so engine-order summation
noise can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a catalog query; ``oracle=None`` marks a genuinely
    non-SQL-expressible op (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_LOADED = False


def _load() -> None:
    global _LOADED
    if not _LOADED:
        from . import llm_pipeline, reference, relational, training_data  # noqa: F401
        from .. import streaming  # noqa: F401  (registers streaming queries)

        _LOADED = True
