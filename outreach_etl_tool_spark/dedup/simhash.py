"""SimHash near-duplicate detection (Charikar '02; SURVEY.md §2.10 L2).

Each document maps to a 64-bit fingerprint whose bits are the signs of
token-hash bit-votes; near-duplicates differ in few bits. Candidate
generation splits the fingerprint into 4 16-bit bands (pigeonhole: any
pair within Hamming distance 3 agrees on ≥1 band) and equi-joins on
(band, chunk) — linear shuffle, no pairwise scan.

The bit-vote accumulation is data-parallel per document and genuinely
awkward as a SQL expression (64 independent popcount accumulators), so
it uses an Arrow-batched pandas UDF — the sanctioned slow path — with
numpy doing the 64-lane vote in C. Everything around it stays JVM.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..functions.text import tokens
from ..operators.util import ensure_parallelism

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _xxhash_like(arr: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit token hash (FNV-1a over utf-8 bytes),
    vectorized per batch. Stable across Python versions (unlike hash())."""
    out = np.empty(len(arr), dtype=np.uint64)
    fnv_offset = np.uint64(0xCBF29CE484222325)
    fnv_prime = np.uint64(0x100000001B3)
    for i, tok in enumerate(arr):
        h = fnv_offset
        for byte in tok.encode("utf-8"):
            h = ((h ^ np.uint64(byte)) * fnv_prime) & _MASK64
        out[i] = h
    return out


@F.pandas_udf(LongType())
def simhash64(token_arrays: pd.Series) -> pd.Series:
    bit_idx = np.arange(64, dtype=np.uint64)
    results = np.empty(len(token_arrays), dtype=np.int64)
    for i, toks in enumerate(token_arrays):
        if toks is None or len(toks) == 0:
            results[i] = 0
            continue
        hashes = _xxhash_like(np.asarray(toks, dtype=object))
        bits = (hashes[:, None] >> bit_idx[None, :]) & np.uint64(1)
        votes = bits.astype(np.int64) * 2 - 1  # bit→+1, no-bit→-1
        agg = votes.sum(axis=0)
        fp = np.uint64(0)
        for j in range(64):
            if agg[j] > 0:
                fp |= np.uint64(1) << np.uint64(j)
        results[i] = np.int64(fp.astype(np.int64))
    return pd.Series(results)


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    df = ensure_parallelism(df)
    return df.withColumn("simhash", simhash64(tokens(text_col)))


def candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs (id_a < id_b) with Hamming(simhash) ≤ max_hamming."""
    fp = with_simhash(df, text_col).select(F.col(id_col).alias("id"), "simhash")
    banded = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", "bk.band", "bk.chunk")

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
            F.col("l.simhash").alias("h_a"),
            F.col("r.simhash").alias("h_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
