"""Dump .explain("formatted") for named registry queries to a dir.

Usage: python tools/dump_plans.py OUTDIR SUFFIX query ...
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outreach_etl_tool_spark.queries import REGISTRY
from outreach_etl_tool_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    Path(outdir).mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        p = Path(outdir) / f"{name}{suffix}.txt"
        p.write_text(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange, "
              f"{plan.count('SortMergeJoin')} SMJ, "
              f"{plan.count('BroadcastHashJoin')} BHJ, "
              f"{plan.count('ArrowEvalPython')} ArrowEval -> {p}")


if __name__ == "__main__":
    main()
