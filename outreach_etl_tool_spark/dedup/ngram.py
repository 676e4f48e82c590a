"""Exact n-gram Jaccard similarity self-join (SURVEY.md §2.10 L2).

The exact counterpart to MinHash: explode distinct shingles to
(shingle, id) pairs, self-join on shingle to count intersections, then
jaccard = |∩| / (|A| + |B| - |∩|). Correct and fully distributed, but
the shingle join can blow up on low-entropy corpora — this is the
verification/small-partition tool; MinHash (minhash.py) is the scale
path. A `partition_col` restricts pairs to the same partition (e.g.
`source`), which is also how a 100 TB run would shard it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.util import ensure_parallelism
from .minhash import shingles


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    partition_col: str | None = None,
) -> DataFrame:
    """Pairs (id_a < id_b) with k-shingle Jaccard ≥ threshold."""
    df = ensure_parallelism(df)
    part = F.col(partition_col) if partition_col else F.lit(0)
    base = df.select(
        F.col(id_col).alias("id"),
        part.alias("part"),
        shingles(text_col, k).alias("sh"),
    ).filter(F.size("sh") > 0)
    sizes = base.select("id", "part", F.size("sh").alias("n_sh"))

    exploded = base.select("id", "part", F.explode("sh").alias("shingle"))
    l, r = exploded.alias("l"), exploded.alias("r")
    common = (
        l.join(
            r,
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.part") == F.col("r.part"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )

    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
