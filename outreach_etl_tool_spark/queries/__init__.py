"""Query registry: every SURVEY.md §2 operator as a named, oracle-paired query.

Each entry is a :class:`QuerySpec`:

- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation;
- ``oracle`` — equivalent ANSI SQL for DuckDB over the same parquet
  views (None for non-SQL-expressible ops → driver does rows-only);
- ``tags`` — SURVEY.md §2 operator ids this query demonstrates;
- ``bench`` — whether bench.py times it as a headline query.

Column-name contract: every computed column is aliased identically in
the Spark plan and the oracle SQL (the driver sorts columns by name
before hashing).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()
    bench: bool = False
    doc: str = ""


def _build_registry() -> dict[str, QuerySpec]:
    from . import aggregates, core, events, joins, llm, pipeline, udfs, windows

    registry: dict[str, QuerySpec] = {}
    for mod in (core, joins, aggregates, windows, events, llm, pipeline, udfs):
        for name, spec in mod.QUERIES.items():
            if name in registry:
                raise ValueError(f"duplicate query name {name!r}")
            registry[name] = spec
    return registry


REGISTRY: dict[str, QuerySpec] = _build_registry()
