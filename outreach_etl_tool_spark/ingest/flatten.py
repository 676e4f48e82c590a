"""JSON flattening with the reference's exact naming scheme
(etl_tools.py:177-193; SURVEY.md §1.1, §2.8 F8).

Naming contract (golden-tested against /root/reference/schemas/*.json):

- dict keys join the path with ``_``: ``{"a": {"b": 1}}`` → ``a_b``;
- list positions become path segments: ``{"emails": ["x","y"]}`` →
  ``emails_0``, ``emails_1``; nested lists compose —
  ``contactHistogram`` (12×2 matrix) → ``contactHistogram_0_0`` …
  ``contactHistogram_11_1``;
- only leaves emit columns; the trailing separator is stripped.

Two implementations of the same contract:

- :func:`flatten_record` — plain-Python, per-record (driver-side
  control plane: page parsing, golden tests). Exactly mirrors the
  reference's recursion.
- :func:`flatten_df` — the Spark *operator*: takes a DataFrame whose
  columns may be struct/array (the engine keeps data nested,
  SURVEY.md §1.1) and projects the flat layout in one `select` — pure
  Catalyst expressions (GetStructField / GetArrayItem), no UDF, no
  shuffle, fully codegen'd and column-pruned. Out-of-range list
  indices yield null, matching the reference's absent-column → NaN
  semantics (etl_tools.py:41).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_record(record: dict[str, Any], sep: str = "_") -> dict[str, Any]:
    """Flatten one (possibly nested) JSON object to a flat dict."""
    out: dict[str, Any] = {}

    def walk(node: Any, path: str) -> None:
        if isinstance(node, dict):
            for key, val in node.items():
                walk(val, f"{path}{key}{sep}")
        elif isinstance(node, list):
            for i, val in enumerate(node):
                walk(val, f"{path}{i}{sep}")
        else:
            out[path[: -len(sep)]] = node

    walk(record, "")
    return out


_DEFAULT_ITEMS = 2


def _limit_for(path: str, array_limits: dict[str, int] | None, default: int) -> int:
    if array_limits and path in array_limits:
        return array_limits[path]
    return default


def _flatten_col(
    col: Column,
    dtype: T.DataType,
    path: str,
    array_limits: dict[str, int] | None,
    default_items: int,
    out: list[Column],
) -> None:
    if isinstance(dtype, T.StructType):
        for f in dtype.fields:
            _flatten_col(
                col.getField(f.name), f.dataType, f"{path}_{f.name}",
                array_limits, default_items, out,
            )
    elif isinstance(dtype, T.ArrayType):
        n = _limit_for(path, array_limits, default_items)
        for i in range(n):
            # F.get is null out of range (ANSI-safe) → the reference's
            # NaN-for-absent semantics
            _flatten_col(
                F.get(col, i), dtype.elementType, f"{path}_{i}",
                array_limits, default_items, out,
            )
    elif isinstance(dtype, T.MapType):
        # open-ended blocks (custom1..55) need declared keys to flatten;
        # callers list them via array_limits-style naming is not enough —
        # keep maps as-is (queryable via element_at); SURVEY.md §1.1.
        out.append(col.alias(path))
    else:
        out.append(col.alias(path))


def flatten_df(
    df: DataFrame,
    array_limits: dict[str, int] | None = None,
    default_items: int = _DEFAULT_ITEMS,
) -> DataFrame:
    """Project every nested column to the reference's flat layout.

    ``array_limits`` maps a flattened path prefix (e.g.
    ``"attributes_emails"``) to the number of positional columns to
    emit; unlisted arrays emit ``default_items``.
    """
    cols: list[Column] = []
    for f in df.schema.fields:
        _flatten_col(F.col(f.name), f.dataType, f.name, array_limits,
                     default_items, cols)
    return df.select(*cols)


def flatten_schema_names(
    schema: T.StructType,
    array_limits: dict[str, int] | None = None,
    default_items: int = _DEFAULT_ITEMS,
) -> list[str]:
    """The flat column names :func:`flatten_df` would produce."""
    names: list[str] = []

    def walk(dtype: T.DataType, path: str) -> None:
        if isinstance(dtype, T.StructType):
            for f in dtype.fields:
                walk(f.dataType, f"{path}_{f.name}" if path else f.name)
        elif isinstance(dtype, T.ArrayType):
            for i in range(_limit_for(path, array_limits, default_items)):
                walk(dtype.elementType, f"{path}_{i}")
        else:
            names.append(path)

    for f in schema.fields:
        walk(f.dataType, f.name)
    return names
