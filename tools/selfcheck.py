"""Local replica of the driver's correctness gate.

Runs every REGISTRY query on Spark at the given sf, runs its DuckDB
oracle on the same parquet, and compares row count, (loose) schema,
and order-insensitive values. Reports exact float mismatches so
determinism risks surface before the driver sees them.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outreach_etl_tool_spark import TABLES
from outreach_etl_tool_spark.queries import REGISTRY
from outreach_etl_tool_spark.session import get_spark


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if df.empty:
        return df.reset_index(drop=True)
    # normalize for sort: stringify everything deterministically
    key = df.astype(str).agg("|".join, axis=1)
    return df.loc[key.sort_values(kind="mergesort").index].reset_index(drop=True)


def compare(name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pd) != len(duck_pd):
        problems.append(f"rowcount spark={len(spark_pd)} duck={len(duck_pd)}")
        return problems
    if sorted(spark_pd.columns) != sorted(duck_pd.columns):
        problems.append(
            f"columns spark={sorted(spark_pd.columns)} duck={sorted(duck_pd.columns)}"
        )
        return problems
    s, d = canon(spark_pd), canon(duck_pd)
    for col in s.columns:
        sv, dv = s[col], d[col]
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            svf = pd.to_numeric(sv, errors="coerce")
            dvf = pd.to_numeric(dv, errors="coerce")
            both_nan = svf.isna() & dvf.isna()
            neq = ~both_nan & (svf != dvf)
            if neq.any():
                delta = (svf[neq] - dvf[neq]).abs().max()
                problems.append(
                    f"col {col}: {int(neq.sum())} float mismatches, max |Δ|={delta!r}"
                )
        else:
            sv_s, dv_s = sv.astype(str), dv.astype(str)
            neq = sv_s != dv_s
            if neq.any():
                i = int(neq.idxmax())
                problems.append(
                    f"col {col}: {int(neq.sum())} mismatches, first at row {i}: "
                    f"spark={sv_s[i]!r} duck={dv_s[i]!r}"
                )
    # dtype check — a HARD failure: the driver hashes typed values, so a
    # HUGEINT→float64 oracle vs an int64 Spark column diverges even when
    # every value prints identically (seen: pipeline_clean_corpus r2).
    for col in s.columns:
        sd, dd = str(spark_pd[col].dtype), str(duck_pd[col].dtype)
        if sd != dd and not _dtype_equiv(sd, dd):
            problems.append(f"DTYPE col {col}: spark={sd} duck={dd}")
    return problems


def _dtype_equiv(a: str, b: str) -> bool:
    """Representation-only differences that hash identically downstream.

    Both engines return tz-naive timestamps; pandas may label them
    datetime64[ns] vs datetime64[us] depending on the Arrow path. Values
    compare equal, and the driver's canonicalization stringifies them the
    same way, so unit-only differences are not a correctness risk.
    """
    pair = {a, b}
    return pair <= {"datetime64[ns]", "datetime64[us]", "object"} and (
        "object" not in pair or any(x.startswith("datetime64") for x in pair)
    )


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or list(REGISTRY)

    spark = get_spark(shuffle_partitions=16)
    con = duck_connection(sf_dir)
    failures = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            spark_pd = sdf.toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if spec.oracle is None:
            print(f"rows  {name}: {len(spark_pd)} rows (no oracle) [{t_spark:.1f}s]")
            continue
        try:
            duck_pd = con.execute(spec.oracle).fetchdf()
        except Exception:
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            failures += 1
            continue
        problems = compare(name, spark_pd, duck_pd)
        hard = [p for p in problems if not p.startswith("DTYPE")]
        status = "ok  " if not hard else "FAIL"
        if hard:
            failures += 1
        print(f"{status}  {name}: {len(spark_pd)} rows [{t_spark:.1f}s]")
        for p in problems:
            print(f"      {p}")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
