"""Ingestion layer: JSON-API flattening, reference-schema loading, and
the paginated REST sync re-expressed as a (distributable) batch driver.

Reference parity surface (SURVEY.md §2.1 S1-S3, §2.8 F8, §3.1-3.3),
minus the reference's four replication bugs (SURVEY.md §2.12).
"""

from .flatten import (
    array_sizes_of,
    flatten_df,
    flatten_record,
    flatten_schema_names,
    unflatten_schema,
)
from .schema_loader import (
    coerce_types,
    empty_frame,
    load_ref_schema,
    ref_schema_to_struct,
)

__all__ = [
    "array_sizes_of",
    "flatten_df",
    "flatten_record",
    "flatten_schema_names",
    "unflatten_schema",
    "load_ref_schema",
    "ref_schema_to_struct",
    "empty_frame",
    "coerce_types",
]
