"""Embedding-cosine near-duplicate detection via random-hyperplane LSH
(SURVEY.md §2.10 L2 / L3 scale path).

SimHash-for-vectors (Charikar '02): P fixed random hyperplanes map
each embedding to a P-bit sign pattern; cos(a,b) close to 1 ⇒ few sign
disagreements. Bucketing on bands of the sign pattern turns the O(n²)
cosine self-join into an equi-join, then candidates are verified with
the exact cosine (functions/vectors.py) so output has no false
positives.

The hyperplanes are generated driver-side from a fixed seed (tiny:
P×dim doubles) and captured in the sign-bit pandas UDF's closure —
they ship with the serialized task, and each Arrow batch is one numpy
matrix multiply.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from ..operators.util import ensure_parallelism


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def sign_bits(vec_col: Column | str, planes: np.ndarray) -> Column:
    """P-bit sign pattern of `vec` against each hyperplane, as a long.

    One Arrow round-trip + a numpy (n×dim)@(dim×P) matrix multiply per
    batch. The pure-expression alternative is P interpreted
    zip_with/aggregate passes per row (higher-order functions are not
    codegen'd) and measures ~10× slower.
    """
    planes_t = planes.T.copy()  # (dim, P)
    powers = (1 << np.arange(planes.shape[0], dtype=np.uint64)).astype(np.uint64)

    @F.pandas_udf(LongType())
    def bits_udf(vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(vecs), dtype=np.int64)
        ok = vecs.notna().to_numpy()
        if ok.any():
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in vecs[ok]]
            )  # (n, dim)
            dots = mat @ planes_t  # (n, P)
            bits = ((dots > 0).astype(np.uint64) * powers[None, :]).sum(
                axis=1, dtype=np.uint64
            )
            out[ok] = bits.astype(np.int64)
        return pd.Series(out)

    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return bits_udf(c)


def near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 64,
    bands: int = 8,
    cosine_threshold: float = 0.9,
    seed: int = 42,
) -> DataFrame:
    """Pairs (id_a < id_b) with cosine ≥ threshold, found via LSH buckets.

    Band width = n_planes/bands sign bits → 2^width buckets per band;
    widen bands as the corpus grows so bucket occupancy (and the
    candidate count, which is quadratic in it) stays flat. 8-bit bands
    give ~94% recall at cosine 0.9 with a candidate set ~3% of all
    pairs on uniform data; a billion-vector run would use 16-20-bit
    bands and more of them.
    """
    df = ensure_parallelism(df)
    if n_planes % bands:
        raise ValueError("bands must divide n_planes")
    width = n_planes // bands
    planes = _hyperplanes(dim, n_planes, seed)

    sig = df.select(
        F.col(id_col).alias("id"),
        sign_bits(vec_col, planes).alias("bits"),
    )
    # Band keys only — vectors never ride through the ×B explode or the
    # bucket self-join; they re-attach to the (tiny) candidate set.
    banded = sig.select(
        "id",
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
    ).select("id", "bk.band", "bk.chunk")
    from .minhash import bucket_pairs

    # localCheckpoint, not persist (cache-leak hygiene: freed with the
    # frame reference instead of living in the session CacheManager)
    cand = bucket_pairs(banded, ["band", "chunk"]).localCheckpoint()
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    verified = (
        cand.join(vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("v_a")), "id_a")
        .join(vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("v_b")), "id_b")
    )
    return (
        verified.withColumn("cos_sim", _pair_cosine("v_a", "v_b"))
        .filter(F.col("cos_sim") >= cosine_threshold)
        .select("id_a", "id_b", "cos_sim")
    )


@F.pandas_udf(DoubleType())
def _pair_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized pairwise cosine for candidate verification (rows-only
    path; the oracle-matched queries use the deterministic JVM fold in
    functions/vectors.py instead)."""
    out = np.full(len(a), np.nan)
    ok = (a.notna() & b.notna()).to_numpy()
    if ok.any():
        ma = np.stack([np.asarray(v, dtype=np.float64) for v in a[ok]])
        mb = np.stack([np.asarray(v, dtype=np.float64) for v in b[ok]])
        num = (ma * mb).sum(axis=1)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out[ok] = num / den
    return pd.Series(out)
