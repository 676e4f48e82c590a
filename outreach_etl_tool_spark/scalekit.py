"""Scaling-evidence toolkit: synthetic scale slices + timing helpers.

The driver ships sf0.001/sf0.01/sf0.1; sub-linearity claims need a
third point above the largest shipped scale. ``build_documents_slice``
manufactures one deterministically from the sf0.1 documents table:
N replicas, each offsetting doc_id by a stride and perturbing the text
with a length-preserving transform (identity / reverse /
vowel-translate). Within a replica the duplicate-pair structure of
the original corpus is preserved exactly. Across replicas the
transforms are fixed-point-free for natural-language grams — but not
universally: a vowel-free gram (digit/consonant/separator runs) is a
fixed point of the translate, and a palindromic gram (single-char
runs) of the reverse, so such grams DO collide across replicas. On
the shipped prose-like corpus these are negligible and the duplicate
graph grows ~linearly (N×) — the regime where super-linear operator
cost has nowhere to hide; for corpora dominated by separator art or
numeric tables the slice would overstate duplication, and a salt
inserted per replica would be the fix.

Shared by tests/test_scaling.py (assertion form) and
tools/gen_scaling.py (committed SCALING.md table form) so both read
the same slice definition.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# replica perturbations: each preserves length and in-replica duplicate
# structure while making cross-replica 64-char grams distinct
REPLICA_PERTURB = (
    lambda c: c,  # replica 0: identity
    F.reverse,
    lambda c: F.translate(c, "aeiou", "01234"),
)


def build_documents_slice(
    spark: SparkSession, src_dir: str, dest: str | Path
) -> str:
    """Materialize the 3× documents slice under ``dest`` (idempotent
    AND concurrency-safe: built into a tmp dir, published by atomic
    rename via :func:`queries.fixtures.atomic_fixture` — concurrent
    pytest and tools/gen_scaling.py runs sharing a slice dir can
    never observe a half-written slice or race the overwrite).
    Returns the slice dir usable as an sf_dir for documents-only
    queries."""
    from .catalog import load_table
    from .queries.fixtures import atomic_fixture

    def build(tmp: Path) -> None:
        docs = load_table(spark, src_dir, "documents")
        stride = docs.agg(F.max("doc_id")).first()[0] + 1
        reps: list[DataFrame] = [
            docs.select(
                (F.col("doc_id") + F.lit(i * stride)).alias("doc_id"),
                perturb(F.col("text")).alias("text"),
                "lang",
                "source",
                "n_chars",  # reverse/translate preserve length
            )
            for i, perturb in enumerate(REPLICA_PERTURB)
        ]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    return str(atomic_fixture(Path(dest), build))
