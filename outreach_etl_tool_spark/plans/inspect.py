"""Extract scale-relevant facts from a DataFrame's executed plan.

All helpers work on the *final* physical plan (post-AQE re-plan where
applicable) so what we assert is what actually runs. String parsing of
`executedPlan().toString()` is deliberate: it is the same surface
`.explain()` prints, it is stable across Spark 3.x/4.x for the node
names we match, and it needs no private JVM APIs beyond `_jdf`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_PUSHED = re.compile(r"PushedFilters: \[([^\]]*)\]")
_SCHEMA = re.compile(r"ReadSchema: struct<([^>]*)>")
_CODEGEN = re.compile(r"WholeStageCodegen \((\d+)\)")


def physical_plan(df: DataFrame) -> str:
    """The executed physical plan as `.explain()` would print it."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame, plan: str | None = None) -> list[str]:
    """Filter expressions that reached the parquet scan (one string per
    scan, '' when a scan pushed nothing)."""
    return _PUSHED.findall(plan or physical_plan(df))


def read_schemas(df: DataFrame, plan: str | None = None) -> list[str]:
    """Per-scan projected column lists — the column-pruning receipt.
    A scan whose struct<...> lists the full table width for a narrow
    query is a pruning failure."""
    return _SCHEMA.findall(plan or physical_plan(df))


def exchange_count(df: DataFrame, plan: str | None = None) -> int:
    """Number of shuffle exchanges (each is a full network+disk
    materialization at scale). Broadcast exchanges are counted
    separately by has_operator(df, 'BroadcastExchange')."""
    p = plan or physical_plan(df)
    # 'Exchange hashpartitioning/rangepartitioning/...' but not
    # BroadcastExchange / AQEShuffleRead wrappers
    return len(re.findall(r"(?<!Broadcast)Exchange (?:hash|range|Single|rebalance)", p))


def codegen_span_count(df: DataFrame, plan: str | None = None) -> int:
    """Distinct WholeStageCodegen spans. More fused operators per span
    (fewer spans for the same plan size) keeps rows in registers."""
    ids = _CODEGEN.findall(plan or physical_plan(df))
    return len(set(ids))


def python_eval_modes(df: DataFrame, plan: str | None = None) -> list[str]:
    """Which Python execution nodes the plan contains.

    'BatchEvalPython' = row-at-a-time UDF (the slow path — should never
    appear in this engine); Arrow nodes are the sanctioned vectorized
    escapes.
    """
    p = plan or physical_plan(df)
    return [
        node
        for node in (
            "BatchEvalPython",
            "ArrowEvalPython",
            "FlatMapGroupsInPandas",
            "MapInPandas",
            "MapInArrow",
            "FlatMapGroupsInPandasWithState",
            "AggregateInPandas",
        )
        if node in p
    ]


def has_operator(df: DataFrame, name: str, plan: str | None = None) -> bool:
    return name in (plan or physical_plan(df))


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of Window nodes in the OPTIMIZED logical plan with an
    EMPTY partition spec — the plans Spark executes as one task (the
    'No Partition Defined for Window operation' WARN). A bounded
    frame (a D-row allocation table, a calendar-grain spine, a ≤k-row
    certificate) is a documented exception; an unpartitioned window
    over row-scale data is the single-task anti-pattern. Counted from
    the logical tree (py4j walk), not the plan string — WindowExec's
    toString does not expose emptiness reliably."""
    out = 0
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            out += 1
        for i in range(node.children().size()):
            stack.append(node.children().apply(i))
        # windows can also hide under subquery expressions; plans here
        # are DataFrame-built (no correlated subqueries), so children
        # cover the tree
    return out


@dataclass
class PlanAudit:
    """One query's scale profile, derived entirely from its plan."""

    name: str
    shuffles: int
    broadcast_joins: int
    sortmerge_joins: int
    codegen_spans: int
    python_nodes: list[str] = field(default_factory=list)
    pushed: list[str] = field(default_factory=list)
    scans: list[str] = field(default_factory=list)
    top_k: bool = False

    @property
    def jvm_only(self) -> bool:
        return not self.python_nodes

    @property
    def row_at_a_time_python(self) -> bool:
        return "BatchEvalPython" in self.python_nodes


def audit(name: str, df: DataFrame) -> PlanAudit:
    plan = physical_plan(df)
    return PlanAudit(
        name=name,
        shuffles=exchange_count(df, plan),
        broadcast_joins=plan.count("BroadcastHashJoin"),
        sortmerge_joins=plan.count("SortMergeJoin"),
        codegen_spans=codegen_span_count(df, plan),
        python_nodes=python_eval_modes(df, plan),
        pushed=[p for p in pushed_filters(df, plan) if p],
        scans=read_schemas(df, plan),
        top_k=has_operator(df, "TakeOrderedAndProject", plan),
    )
