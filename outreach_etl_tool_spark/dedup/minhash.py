"""MinHash + LSH near-duplicate detection (SURVEY.md §2.10 L2).

The 100 TB-scale path for near-dedup (Broder '97 / the MinHashLSH
family): instead of the O(n²) pairwise Jaccard, each document is
reduced to H minhash values; documents agree on a band of R
consecutive values with probability j^R (j = true Jaccard), so
banding B=H/R bands turns "Jaccard ≥ τ" into an equi-join on band
keys — a plain shuffle, linear in corpus size.

Everything is JVM expressions (shingling via slice/transform, hashing
via xxhash64, banding via slice+hash) — whole-stage codegen end to
end, no Python. Candidate pairs are then verified with exact Jaccard
on distinct shingles, so the operator's output has no LSH false
positives (only the recall is probabilistic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..functions.text import tokens
from ..operators.util import ensure_parallelism


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles (array<string>), space-joined."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def base_hashes(shingle_col: Column) -> Column:
    """One xxhash64 per shingle (array<long>) — the single string-hash
    pass; the minhash family is derived arithmetically from these."""
    return F.transform(shingle_col, lambda s: F.xxhash64(s))


def _hash_family(num_hashes: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    # odd multipliers → bijective maps on Z/2^64 (datasketch-style a*h+b)
    a = rng.randint(1, 2**62, size=num_hashes, dtype=np.uint64) * 2 + 1
    b = rng.randint(0, 2**62, size=num_hashes, dtype=np.uint64)
    return a, b


def make_minhash_udf(num_hashes: int = 32):
    """Arrow-vectorized minhash: given each doc's base-hash array,
    return the num_hashes minimum values of (a_i*h + b_i) mod 2^64.

    Why a pandas UDF here: the equivalent higher-order-function
    expression is num_hashes interpreted lambda passes per document
    (~10^7 boxed evals per 5k docs); numpy does the same work as a
    handful of C loops over one flattened array. The string hashing
    stays JVM-side (base_hashes), so Arrow only moves longs.
    """
    a_vec, b_vec = _hash_family(num_hashes)

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_udf(hash_arrays: pd.Series) -> pd.Series:
        lengths = hash_arrays.str.len().fillna(0).astype(np.int64).to_numpy()
        out = [None] * len(hash_arrays)
        keep = lengths > 0
        if keep.any():
            flat = np.concatenate(
                [np.asarray(h, dtype=np.int64) for h in hash_arrays[keep]]
            ).astype(np.uint64)
            lens = lengths[keep]
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            sigs = np.empty((num_hashes, len(starts)), dtype=np.uint64)
            for i in range(num_hashes):
                vals = a_vec[i] * flat + b_vec[i]  # wraps mod 2^64
                sigs[i] = np.minimum.reduceat(vals, starts)
            sigs_signed = sigs.astype(np.int64)
            kidx = np.flatnonzero(keep)
            for j, row in enumerate(kidx):
                out[row] = sigs_signed[:, j].tolist()
        return pd.Series(out)

    return minhash_udf


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """Array of ``num_hashes`` minhash values (long)."""
    return make_minhash_udf(num_hashes)(base_hashes(shingle_col))


def candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact Jaccard ≥ threshold.

    Plan shape: scan → signature (narrow) → explode B band keys
    (×B rows, small) → shuffle on band key → self-join within bucket →
    exact-Jaccard verification on the candidate set only.
    """
    df = ensure_parallelism(df)
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rows = num_hashes // bands

    sig = df.select(
        F.col(id_col).alias("id"),
        shingles(text_col, k).alias("sh"),
    ).filter(F.size("sh") > 0)
    sig = sig.withColumn("sig", minhash_signature(F.col("sh"), num_hashes))
    # The signature/shingle table feeds three consumers (banding + two
    # verification joins); persist so shingling+hashing runs once, not 3×.
    # MEMORY_AND_DISK: signatures are ~100× smaller than the corpus.
    sig = sig.persist()

    # Band keys only — the (small) shingle-set payload is re-attached
    # AFTER candidate dedup so it never rides through the ×B explode or
    # the bucket self-join.
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.slice("sig", b * rows + 1, rows)).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bkey")

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    sh_only = sig.select("id", "sh")
    verified = (
        cand.join(sh_only.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh_only.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        verified.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
