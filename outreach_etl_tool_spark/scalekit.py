"""Scaling-evidence toolkit: synthetic scale slices + timing helpers.

The driver ships sf0.001/sf0.01/sf0.1; sub-linearity claims need
points above the largest shipped scale. ``build_documents_slice``
manufactures an N× slice deterministically from the sf0.1 documents
table: N replicas, each offsetting doc_id by a stride and perturbing
the text with a length-preserving Caesar rotation of the letters
(replica i rotates by i). Within a replica the duplicate-pair
structure of the original corpus is preserved exactly (rotation is a
bijection on grams). Across replicas, two different rotations differ
by a non-zero rotation, which is fixed-point-free for every gram
containing at least one letter — only letter-free grams (digit /
separator runs) collide across replicas. On the shipped prose-like
corpus these are negligible and the duplicate graph grows ~linearly
(N×) — the regime where super-linear operator cost has nowhere to
hide; for corpora dominated by separator art or numeric tables the
slice would overstate duplication.

``build_embeddings_slice`` is the companion for the similarity
family: replica i offsets vec_id and ROLLS the embedding array by i
positions — norm-preserving and within-replica-cosine-preserving, so
each replica carries the original corpus's neighborhood structure
while cross-replica cosines stay near-uniform.

Shared by tests/test_scaling.py (assertion form) and
tools/gen_scaling.py (committed SCALING.md table form) so both read
the same slice definition.  SLICE_VERSION is part of the canonical
cache path — bump it whenever slice construction changes, or stale
cached slices keep serving the old construction.
"""

from __future__ import annotations

import string
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SLICE_VERSION = 2  # v2: Caesar-rotation replicas (was reverse/translate)

_LOWER = string.ascii_lowercase
_UPPER = string.ascii_uppercase


def slice_dest(label: str) -> Path:
    """Canonical cache dir for a slice, version-keyed."""
    import tempfile

    return (
        Path(tempfile.gettempdir())
        / "outreach_etl_spark_scale"
        / f"{label}_v{SLICE_VERSION}"
    )


def _rotate(col, i: int):
    """Caesar-rotate letters by i (length-preserving bijection)."""
    if i % 26 == 0:
        return col
    k = i % 26
    return F.translate(
        col,
        _LOWER + _UPPER,
        _LOWER[k:] + _LOWER[:k] + _UPPER[k:] + _UPPER[:k],
    )


def build_documents_slice(
    spark: SparkSession,
    src_dir: str,
    dest: str | Path,
    replicas: int = 3,
) -> str:
    """Materialize the ``replicas``× documents slice under ``dest``
    (idempotent AND concurrency-safe: built into a tmp dir, published
    by atomic rename via :func:`queries.fixtures.atomic_fixture` —
    concurrent pytest and tools/gen_scaling.py runs sharing a slice
    dir can never observe a half-written slice or race the
    overwrite). Returns the slice dir usable as an sf_dir for
    documents-only queries."""
    from .catalog import load_table
    from .queries.fixtures import atomic_fixture

    if not 1 <= replicas <= 26:
        raise ValueError("replicas must be in 1..26 (rotation distinctness)")

    def build(tmp: Path) -> None:
        docs = load_table(spark, src_dir, "documents")
        stride = docs.agg(F.max("doc_id")).first()[0] + 1
        reps: list[DataFrame] = [
            docs.select(
                (F.col("doc_id") + F.lit(i * stride)).alias("doc_id"),
                _rotate(F.col("text"), i).alias("text"),
                "lang",
                "source",
                "n_chars",  # rotation preserves length
            )
            for i in range(replicas)
        ]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(str(tmp / "documents.parquet"))

    return str(atomic_fixture(Path(dest), build))


def build_lineitem_slice(
    spark: SparkSession,
    src_dir: str,
    dest: str | Path,
    replicas: int = 3,
) -> str:
    """Materialize the ``replicas``× lineitem slice for the
    GRAPH family's third scaling point: each replica offsets
    l_orderkey AND l_partkey by a shared stride, so the co-purchase
    graph gains ``replicas`` disjoint copies of the original — node,
    edge and triangle counts grow exactly linearly, the regime where
    a super-linear wedge/pair expansion has nowhere to hide. Other
    columns ride along unchanged (the graph queries never read
    them)."""
    from .catalog import load_table
    from .queries.fixtures import atomic_fixture

    def build(tmp: Path) -> None:
        li = load_table(spark, src_dir, "lineitem")
        stride = (
            li.agg(
                F.greatest(
                    F.max("l_orderkey"), F.max("l_partkey")
                )
            ).first()[0]
            + 1
        )
        reps = [
            li.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * stride)
            ).withColumn(
                "l_partkey", F.col("l_partkey") + F.lit(i * stride)
            )
            for i in range(replicas)
        ]
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(str(tmp / "lineitem.parquet"))

    return str(atomic_fixture(Path(dest), build))


def build_combined_slice(
    spark: SparkSession,
    src_dir: str,
    dest: str | Path,
    replicas: int = 10,
) -> str:
    """Materialize a slice with BOTH tables — ``replicas``× documents
    AND embeddings in one sf_dir — for queries that join them (the
    decontamination report ties embeddings to documents by
    vec_id == doc_id). One SHARED id stride (max over both tables)
    keeps that alignment inside every replica: doc i's embedding in
    replica r is still at vec_id == doc_id. Documents rotate text,
    embeddings roll arrays — both the same bijections the single-table
    slices use."""
    from .catalog import load_table
    from .queries.fixtures import atomic_fixture

    if not 1 <= replicas <= 26:
        raise ValueError("replicas must be in 1..26 (rotation distinctness)")

    def build(tmp: Path) -> None:
        docs = load_table(spark, src_dir, "documents")
        embs = load_table(spark, src_dir, "embeddings")
        stride = max(
            docs.agg(F.max("doc_id")).first()[0],
            embs.agg(F.max("vec_id")).first()[0],
        ) + 1
        dreps = [
            docs.select(
                (F.col("doc_id") + F.lit(i * stride)).alias("doc_id"),
                _rotate(F.col("text"), i).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for i in range(replicas)
        ]
        dout = dreps[0]
        for r in dreps[1:]:
            dout = dout.unionByName(r)
        dout.write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
        dim = F.size("embedding")
        ereps = []
        for i in range(replicas):
            rolled = (
                F.col("embedding")
                if i == 0
                else F.concat(
                    F.slice(F.col("embedding"), i + 1, dim - i),
                    F.slice(F.col("embedding"), 1, i),
                )
            )
            ereps.append(
                embs.select(
                    (F.col("vec_id") + F.lit(i * stride)).alias("vec_id"),
                    rolled.alias("embedding"),
                    "label",
                )
            )
        eout = ereps[0]
        for r in ereps[1:]:
            eout = eout.unionByName(r)
        eout.write.mode("overwrite").parquet(str(tmp / "embeddings.parquet"))

    return str(atomic_fixture(Path(dest), build))


def build_embeddings_slice(
    spark: SparkSession,
    src_dir: str,
    dest: str | Path,
    replicas: int = 10,
) -> str:
    """Materialize the ``replicas``× embeddings slice under ``dest``
    (same atomic-fixture discipline). Replica i rolls each embedding
    array left by i positions — a norm- and within-replica-cosine-
    preserving bijection, so neighborhood structure replicates
    linearly while cross-replica cosines stay near-uniform."""
    from .catalog import load_table
    from .queries.fixtures import atomic_fixture

    def build(tmp: Path) -> None:
        embs = load_table(spark, src_dir, "embeddings")
        stride = embs.agg(F.max("vec_id")).first()[0] + 1
        dim = F.size("embedding")
        reps: list[DataFrame] = []
        for i in range(replicas):
            rolled = (
                F.col("embedding")
                if i == 0
                else F.concat(
                    F.slice(F.col("embedding"), i + 1, dim - i),
                    F.slice(F.col("embedding"), 1, i),
                )
            )
            reps.append(
                embs.select(
                    (F.col("vec_id") + F.lit(i * stride)).alias("vec_id"),
                    rolled.alias("embedding"),
                    "label",
                )
            )
        out = reps[0]
        for r in reps[1:]:
            out = out.unionByName(r)
        out.write.mode("overwrite").parquet(str(tmp / "embeddings.parquet"))

    return str(atomic_fixture(Path(dest), build))
