"""Similarity search over embedding columns (SURVEY.md §2.10 L3).

Two tiers, per the standard ANN playbook:

- `topk_bruteforce` — exact cosine top-k against a query vector. One
  narrow scan (dot product in whole-stage codegen) + TakeOrderedAndProject;
  no shuffle of vectors. This is the baseline and the correctness oracle.
- `topk_ivf` — IVF-style two-stage search: vectors are pre-assigned to
  the nearest of K coarse centroids (a partitioning that would be
  persisted/bucketed at 100 TB); a query scores only the `nprobe`
  nearest cells, scanning ~nprobe/K of the data. Recall < 1 by design;
  tests measure it against brute force.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..operators.util import ensure_parallelism


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def topk_bruteforce(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity (deterministic tiebreak on id)."""
    scored = ensure_parallelism(df).select(
        F.col(id_col),
        cosine(F.col(vec_col), _lit_vec(query)).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF build step: add `cell` = argmin distance (max cosine) centroid.

    At scale this result is written out partitioned/bucketed by `cell`
    so queries prune partitions; here it stays a column.
    """
    best_cell = F.lit(0)
    best_score = cosine(F.col(vec_col), _lit_vec(centroids[0]))
    for i, c in enumerate(centroids[1:], start=1):
        score = cosine(F.col(vec_col), _lit_vec(c))
        better = score > best_score
        best_cell = F.when(better, F.lit(i)).otherwise(best_cell)
        best_score = F.when(better, score).otherwise(best_score)
    return df.withColumn("cell", best_cell)


def topk_ivf(
    df_with_cells: DataFrame,
    centroids: list[list[float]],
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the nprobe nearest cells only, then exact top-k within them."""
    import numpy as np

    q = np.asarray(query, dtype=np.float64)
    cents = np.asarray(centroids, dtype=np.float64)
    sims = (cents @ q) / (np.linalg.norm(cents, axis=1) * np.linalg.norm(q))
    probe = [int(i) for i in np.argsort(-sims)[:nprobe]]

    pruned = df_with_cells.filter(F.col("cell").isin(probe))
    return topk_bruteforce(pruned, query, k, id_col, vec_col)


def sample_centroids(
    df: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic coarse centroids: the embeddings of the first
    n_cells ids (k-means init would refine these; deterministic pick
    keeps tests stable)."""
    rows = (
        df.orderBy(id_col).limit(n_cells).select(vec_col).collect()
    )
    return [[float(v) for v in r[0]] for r in rows]
