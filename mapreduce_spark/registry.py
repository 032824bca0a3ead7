"""Query registry: one entry per operator from SURVEY.md §2.

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable plus
(optionally) the equivalent ANSI SQL a DuckDB oracle can run on the same
parquet tables. The driver's correctness gate compares both sides.

Column-name discipline: every computed column is aliased identically in
the Spark plan and the oracle SQL (the comparison sorts columns by name).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import. Every name here MUST exist —
# a missing module is a real breakage, not something to except away.
_QUERY_MODULES = [
    "mapreduce_spark.operators.relational",
    "mapreduce_spark.operators.analytics",
    "mapreduce_spark.operators.tpch",
    "mapreduce_spark.operators.joins",
    "mapreduce_spark.operators.windows",
    "mapreduce_spark.operators.textops",
    "mapreduce_spark.operators.dedup",
    "mapreduce_spark.operators.curation",
    "mapreduce_spark.operators.graph",
    "mapreduce_spark.operators.similarity",
    "mapreduce_spark.operators.mr",
    "mapreduce_spark.operators.multimodal",
    "mapreduce_spark.streaming.events",
]


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so its queries register."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return REGISTRY


def get_queries() -> dict[str, QueryFn]:
    """Name -> (spark, sf_dir) -> DataFrame for every registered query."""
    load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def get_oracles() -> dict[str, str]:
    """Name -> DuckDB oracle SQL (queries without one are rows-only)."""
    load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
