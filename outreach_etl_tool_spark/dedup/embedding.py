"""Embedding-cosine near-duplicate detection via random-hyperplane LSH
(SURVEY.md §2.10 L2 / L3 scale path).

SimHash-for-vectors (Charikar '02): P fixed random hyperplanes map
each embedding to a P-bit sign pattern; cos(a,b) close to 1 ⇒ few sign
disagreements. Bucketing on bands of the sign pattern turns the O(n²)
cosine self-join into an equi-join, then candidates are verified with
the exact cosine (functions/vectors.py) so output has no false
positives.

The hyperplanes are generated driver-side from a fixed seed (tiny:
P×dim doubles) and folded into the plan as literals — they broadcast
with the serialized plan itself; no Python at execution time.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..operators.util import ensure_parallelism


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def sign_bits(vec_col: Column | str, planes: np.ndarray) -> Column:
    """P-bit sign pattern of `vec` against each hyperplane, as a long."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    acc = F.lit(0).cast("long")
    for p_idx, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                c,
                F.array(*[F.lit(float(v)) for v in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        acc = acc + F.when(dot > 0, F.lit(1 << p_idx).cast("long")).otherwise(0)
    return acc


def near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    cosine_threshold: float = 0.9,
    seed: int = 42,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine ≥ threshold, found via LSH buckets."""
    df = ensure_parallelism(df)
    if n_planes % bands:
        raise ValueError("bands must divide n_planes")
    width = n_planes // bands
    planes = _hyperplanes(dim, n_planes, seed)

    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sign_bits(vec_col, planes).alias("bits"),
    )
    banded = sig.select(
        "id",
        "vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("bits", b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "vec", "bk.band", "bk.chunk")

    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.vec").alias("v_a"),
            F.col("r.vec").alias("v_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("cos_sim", cosine("v_a", "v_b"))
        .filter(F.col("cos_sim") >= cosine_threshold)
        .select("id_a", "id_b", "cos_sim")
    )
