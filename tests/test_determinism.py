"""Run-to-run determinism of the rows-only registry queries.

Oracled queries are value-hash-compared against DuckDB, which pins
their determinism for free. Rows-only queries (sketches, LSH, ANN,
UDF demos) have no oracle — but the driver's evidence is only
meaningful if two runs of the same query over the same data produce
the SAME rows. The known hazard class is float folds over
shuffle-fetch order (non-associative addition → ulp drift →
different top-k sets near a cutoff); this test executes every
rows-only query twice at sf0.001 and requires identical canonical
frames, so any reintroduction of order-dependent float math fails
here instead of flaking the gate.
"""

from __future__ import annotations

import pandas as pd
import pytest

from outreach_etl_tool_spark.queries import REGISTRY


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if df.empty:
        return df.reset_index(drop=True)
    key = df.astype(str).agg("|".join, axis=1)
    return df.loc[key.sort_values(kind="mergesort").index].reset_index(
        drop=True
    )


@pytest.mark.slow
def test_rows_only_queries_are_run_to_run_deterministic(spark, sf_dir):
    rows_only = [n for n, s in REGISTRY.items() if s.oracle is None]
    assert rows_only  # the class under test exists
    diffs = []
    for name in rows_only:
        spec = REGISTRY[name]
        a = _canon(spec.fn(spark, sf_dir).toPandas())
        spark.catalog.clearCache()  # second run from a cold plan
        b = _canon(spec.fn(spark, sf_dir).toPandas())
        if not a.equals(b):
            unequal = [
                c for c in a.columns if not a[c].equals(b[c])
            ] if list(a.columns) == list(b.columns) and len(a) == len(b) else [
                "shape"
            ]
            diffs.append(f"{name}: runs differ in {unequal}")
    assert not diffs, "\n".join(diffs)
