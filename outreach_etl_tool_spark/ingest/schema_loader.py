"""Reference-schema loading: the declared-schema contract of
etl_tools.py:33-61 (SURVEY.md §1.1-1.2) on Spark types.

The reference's schema files map flattened column name →
``{"type": ["null", <t>]}``; every column is nullable. Type mapping
(SURVEY.md §1.2): string→String, boolean→Boolean, integer→Long (64-bit
— the reference's pandas downcast is a memory hack we do not copy),
float→Double, datetime→Timestamp.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPE_MAP: dict[str, T.DataType] = {
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "integer": T.LongType(),
    "float": T.DoubleType(),
    "datetime": T.TimestampType(),
}


def load_ref_schema(path: str | Path) -> dict[str, str]:
    """Read a reference-style schema file → {column: type_name}."""
    with open(path) as fh:
        raw = json.load(fh)
    out: dict[str, str] = {}
    for col, spec in raw.items():
        declared = spec["type"]
        # every reference entry is ["null", <t>]; be liberal about order
        t = next(x for x in declared if x != "null")
        if t not in _TYPE_MAP:
            raise ValueError(f"unknown declared type {t!r} for column {col!r}")
        out[col] = t
    return out


def ref_schema_to_struct(schema: dict[str, str]) -> T.StructType:
    """{column: type_name} → flat StructType (all nullable)."""
    return T.StructType(
        [T.StructField(col, _TYPE_MAP[t], nullable=True) for col, t in schema.items()]
    )


def empty_frame(spark: SparkSession, schema: dict[str, str]) -> DataFrame:
    """0-row frame with every declared column (etl_tools.py:37-43
    parity) — unions against it align pages to the full column set."""
    return spark.createDataFrame([], ref_schema_to_struct(schema))


def coerce_types(df: DataFrame, schema: dict[str, str]) -> DataFrame:
    """Cast string-typed ingest columns to their declared types
    (etl_tools.py:45-61 parity). Unparseable values become null
    (try_* semantics) rather than failing the batch — the reference's
    pandas coercion raised, which at 100 TB means one bad record kills
    a day's sync."""
    cols = []
    for f in df.schema.fields:
        declared = schema.get(f.name)
        if declared is None or not isinstance(f.dataType, T.StringType):
            cols.append(F.col(f.name))
            continue
        target = _TYPE_MAP[declared]
        if isinstance(target, T.StringType):
            cols.append(F.col(f.name))
        elif isinstance(target, T.TimestampType):
            cols.append(F.try_to_timestamp(F.col(f.name)).alias(f.name))
        elif isinstance(target, T.BooleanType):
            cols.append(F.col(f.name).try_cast("boolean").alias(f.name))
        elif isinstance(target, T.LongType):
            cols.append(F.col(f.name).try_cast("bigint").alias(f.name))
        else:
            cols.append(F.col(f.name).try_cast("double").alias(f.name))
    return df.select(*cols)
