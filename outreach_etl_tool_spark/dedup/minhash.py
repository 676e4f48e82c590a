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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-token shingles (array<string>), space-joined."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """Array of ``num_hashes`` minhash values (long). Hash family h_i =
    xxhash64(seed_i, shingle) — independent enough in practice."""
    mins = [
        F.array_min(
            F.transform(shingle_col, lambda s, i=i: F.xxhash64(F.lit(i), s))
        )
        for i in range(num_hashes)
    ]
    return F.array(*mins)


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
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rows = num_hashes // bands

    sig = df.select(
        F.col(id_col).alias("id"),
        shingles(text_col, k).alias("sh"),
    ).filter(F.size("sh") > 0)
    sig = sig.withColumn("sig", minhash_signature(F.col("sh"), num_hashes))

    banded = sig.select(
        "id",
        "sh",
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
    ).select("id", "sh", "bk.band", "bk.bkey")

    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
