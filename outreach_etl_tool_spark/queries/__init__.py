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


# Driver-facing ordering: a neutral least-recently-evidenced rotation.
#
# The external correctness gate evidences only the first ~50 registry
# entries per round, so dict order decides WHICH queries get driver
# evidence. Rather than hand-picking a window, the registry sorts
# itself against the generated evidence ledger (queries/evidence.py,
# derived mechanically from the driver's own CORRECTNESS_r*.json by
# tools/update_evidence.py):
#
#   tier 0 — never driver-evidenced (must be proven first);
#   tier 1 — failed/errored in their most recent driver run;
#   tier 2 — evidenced ROWS-ONLY but the registry spec now carries an
#            oracle (oracle-upgrade pending): the existing evidence is
#            weaker BY KIND than what the query can prove, so it
#            outranks merely-aged green evidence;
#   tier 3 — evidenced, oldest round first (cyclic re-verification,
#            so no query's green status silently goes stale).
#
# Ties break by round then alphabetically. The policy stays purely
# mechanical (ledger + current spec — no hand-picked window): every
# query re-enters the window as its evidence ages, and nothing can be
# parked outside it indefinitely.
def _rotation_key(name: str) -> tuple[int, int, str]:
    from .evidence import LEDGER

    entry = LEDGER.get(name)
    if entry is None:
        return (0, 0, name)
    rnd, status = entry
    if status == "fail":
        tier = 1
    elif status == "rows" and _REGISTRY_SPECS[name].oracle is not None:
        tier = 2
    else:
        tier = 3
    return (tier, rnd, name)


def _build_registry() -> dict[str, QuerySpec]:
    from . import (
        aggregates, core, events, extended, graph, joins, llm, pipeline,
        sqlplus, streamingq, tpch, udfs, windows,
    )

    by_module: dict[str, QuerySpec] = {}
    for mod in (
        core, joins, aggregates, windows, events, llm, pipeline, udfs, extended,
        streamingq, sqlplus, graph, tpch,
    ):
        for name, spec in mod.QUERIES.items():
            if name in by_module:
                raise ValueError(f"duplicate query name {name!r}")
            by_module[name] = spec
    global _REGISTRY_SPECS
    _REGISTRY_SPECS = by_module
    return {name: by_module[name] for name in sorted(by_module, key=_rotation_key)}


# unsorted specs, visible to _rotation_key for the tier-2
# oracle-upgrade check (set by _build_registry before sorting)
_REGISTRY_SPECS: dict[str, QuerySpec] = {}


REGISTRY: dict[str, QuerySpec] = _build_registry()
