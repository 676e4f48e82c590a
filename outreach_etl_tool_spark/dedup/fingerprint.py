"""Generic banded near-dup over 64-bit fingerprints (SURVEY.md §2.10
L2/L5 shared machinery).

Any operator that reduces an item to a 64-bit locality-sensitive
fingerprint — text simhash, image perceptual hash, audio chroma hash —
shares one candidate-generation shape: split the 64 bits into 4×16-bit
bands (pigeonhole: Hamming ≤ 3 pairs agree on ≥ 1 band), bucket-join
on (band, chunk), verify with an exact popcount on the XOR. The band
explode carries two small integers per item×band; fingerprints
re-attach only to the candidate set. Linear in corpus size, one
bucket shuffle — the same scale shape as the MinHash path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .minhash import bucket_pairs


def fingerprint_pairs(
    fp: DataFrame,
    id_col: str = "id",
    hash_col: str = "fp",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs (id_a < id_b, hamming) with Hamming(hash64) ≤ max_hamming.

    Recall guarantee covers Hamming ≤ 3 (4 bands); larger thresholds
    still verify exactly but recall becomes probabilistic.
    """
    base = fp.select(F.col(id_col).alias("id"), F.col(hash_col).alias("__fp"))
    banded = base.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("__fp", b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.chunk")
    # localCheckpoint, not persist: both multi-consumer frames are tiny
    # (candidate pairs / candidate-only fingerprints) but a persist()
    # entry outlives the call in the session CacheManager; checkpointed
    # blocks are freed with the frame reference.
    cand = bucket_pairs(banded, ["band", "chunk"]).localCheckpoint()
    cand_ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    fp_small = base.join(cand_ids, "id", "left_semi").localCheckpoint()
    verified = (
        cand.join(
            fp_small.select(F.col("id").alias("id_a"), F.col("__fp").alias("h_a")),
            "id_a",
        ).join(
            fp_small.select(F.col("id").alias("id_b"), F.col("__fp").alias("h_b")),
            "id_b",
        )
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        verified.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
