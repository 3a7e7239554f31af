"""Single registry of every driver-checkable query + its DuckDB oracle.

Aggregates the per-module ``QUERIES`` dicts. Keys are the names the driver
records in CORRECTNESS_r{N}.json; a ``None`` oracle means rows-only check
(non-SQL-expressible op, e.g. the PDF content-stream parser). An oracle may
also be a zero-arg callable returning the SQL — resolved lazily by
``oracle_sql()`` so expensive setup (e.g. building the synthetic expected
corpus) is never an import side effect.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    advanced,
    analytics,
    dedup,
    extraction_queries,
    graph,
    jsonl_source,
    multimodal,
    similarity,
    sketches,
    textstats,
    training,
)

_MODULES = (
    extraction_queries,
    analytics,
    advanced,
    dedup,
    similarity,
    textstats,
    training,
    multimodal,
    sketches,
    graph,
    jsonl_source,
)

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}
for _m in _MODULES:
    for _name, (_fn, _sql) in _m.QUERIES.items():
        assert _name not in REGISTRY, f"duplicate query name {_name}"
        REGISTRY[_name] = (_fn, _sql)


def _with_shipping(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ..shipping import ensure_shipped
        from .dedup import release_caches

        # The DRIVER harness never calls release_caches() itself, so free
        # the PREVIOUS query's staged intermediates here. ORDERING CONTRACT
        # (ADVICE r03): this assumes build->collect->build->collect — a
        # caller that builds query B before collecting query A unpersists
        # A's staged subtrees (still correct, A just recomputes, defeating
        # the staging the plan audits pin), and the session's LAST query
        # keeps its caches until the next build or session stop. Callers
        # that control their own loop (tools/check_oracle.py, bench.py,
        # tests/conftest.py) release after every action instead.
        release_caches()
        ensure_shipped(spark)  # executors must import this package (kernels)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_shipping(fn) for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: (sql() if callable(sql) else sql)
        for name, (_fn, sql) in REGISTRY.items()
        if sql is not None
    }
