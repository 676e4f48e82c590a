"""Per-query profiler: run one registry query under the bench's exact
session config (plus the UI REST API) and report where the time goes.

For each named query:
  * one untimed warm pass (bench methodology), then a timed noop pass;
  * the stage-level breakdown from the UI REST API — duration, task
    count, input/shuffle bytes, per-stage name — sorted by duration;
  * optionally (--plan DIR) the .explain("formatted") output written to
    DIR/<query>.txt.

Usage: python tools/profile_query.py [--plan DIR] [--suffix S] query ...
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

from outreach_etl_tool_spark.queries import REGISTRY
from outreach_etl_tool_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _rest(app_port: int, path: str):
    url = f"http://localhost:{app_port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plan", default=None, help="dir for explain output")
    ap.add_argument("--suffix", default="", help="plan filename suffix")
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    # build the session with the UI on, otherwise identical to bench's
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.appName("profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    port = 4040

    # python-worker pool warm-up (bench methodology)
    spark.range(64).repartition(32).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()

    for name in args.queries:
        spec = REGISTRY[name]
        # warm pass
        spark.sparkContext.setJobDescription(f"{name}: warm")
        spec.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

        best = None
        for _ in range(max(1, args.repeat)):
            app_id = _rest(port, "applications")[0]["id"]
            stages_before = {
                s["stageId"] for s in _rest(port, f"applications/{app_id}/stages")
            }
            spark.sparkContext.setJobDescription(f"{name}: timed")
            t0 = time.perf_counter()
            df = spec.fn(spark, SF_DIR)
            t_build = time.perf_counter() - t0
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            if best is None or dt < best[0]:
                best = (dt, t_build, app_id, stages_before)

        dt, t_build, app_id, stages_before = best
        stages = [
            s
            for s in _rest(port, f"applications/{app_id}/stages")
            if s["stageId"] not in stages_before and s["status"] != "SKIPPED"
        ]
        total_stage_ms = 0
        rows = []
        for s in stages:
            sub = (s.get("submissionTime") or "")[:23]
            comp = (s.get("completionTime") or "")[:23]
            dur = None
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f"
                dur = (
                    datetime.strptime(comp, fmt) - datetime.strptime(sub, fmt)
                ).total_seconds()
            except Exception:
                pass
            rows.append(
                (
                    dur or 0.0,
                    s["stageId"],
                    s["numTasks"],
                    s.get("inputBytes", 0),
                    s.get("shuffleReadBytes", 0),
                    s.get("shuffleWriteBytes", 0),
                    (s.get("description") or s.get("name", ""))[:110],
                )
            )
            total_stage_ms += (dur or 0.0) * 1000
        rows.sort(reverse=True)
        print(f"\n=== {name}: {dt:.3f}s wall ({t_build:.3f}s build) "
              f"{len(stages)} stages, {total_stage_ms/1000:.2f}s stage-time ===")
        print(f"{'sec':>7} {'stage':>5} {'tasks':>5} {'input':>10} "
              f"{'shufR':>10} {'shufW':>10}  name")
        for dur, sid, ntask, inp, sr, sw, nm in rows[:24]:
            print(f"{dur:7.3f} {sid:5d} {ntask:5d} {inp:10d} {sr:10d} {sw:10d}  {nm}")

        if args.plan:
            pdir = Path(args.plan)
            pdir.mkdir(parents=True, exist_ok=True)
            plan = spec.fn(spark, SF_DIR)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (pdir / f"{name}{args.suffix}.txt").write_text(plan)
            print(f"plan -> {pdir / (name + args.suffix + '.txt')}")


if __name__ == "__main__":
    main()
