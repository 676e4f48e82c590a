"""Physical-plan introspection for scale auditing.

The reference engine hand-schedules its physical strategy (server-side
filter/sort/limit pushdown via querystring, cardinality-based per-day
chunking — /root/reference/outreach_etl.py:115-117,157-188). On Spark,
Catalyst owns those decisions; what the engine owes instead is *proof*
that the declarative plans actually hit the strategies we designed for
100 TB: filters reaching the parquet scan, small dims broadcast, top-k
as TakeOrderedAndProject, hot paths inside WholeStageCodegen, and no
gratuitous shuffles. This package makes those properties programmatic
so tests and reports assert them instead of eyeballing `.explain`.
"""

from outreach_etl_tool_spark.plans.inspect import (
    PlanAudit,
    audit,
    codegen_span_count,
    exchange_count,
    has_operator,
    physical_plan,
    pushed_filters,
    python_eval_modes,
    read_schemas,
    unpartitioned_window_count,
)
from outreach_etl_tool_spark.plans.report import plan_report

__all__ = [
    "PlanAudit",
    "audit",
    "codegen_span_count",
    "exchange_count",
    "has_operator",
    "physical_plan",
    "plan_report",
    "pushed_filters",
    "python_eval_modes",
    "read_schemas",
    "unpartitioned_window_count",
]
