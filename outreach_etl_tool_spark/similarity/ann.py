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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

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
    """IVF build step: add `cell` = argmax-cosine centroid index.

    One Arrow round-trip + an (n×dim)@(dim×C) numpy matmul per batch —
    the per-centroid expression alternative is C interpreted
    zip_with/aggregate passes per row and measures ~10× slower.

    At scale this result is written out partitioned/bucketed by `cell`
    so queries prune partitions; here it stays a column.
    """
    cents = np.asarray(centroids, dtype=np.float64)  # (C, dim)
    cents_unit = (cents / np.linalg.norm(cents, axis=1, keepdims=True)).T

    @F.pandas_udf(IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        out = np.zeros(len(vecs), dtype=np.int32)
        ok = vecs.notna().to_numpy()
        if ok.any():
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[ok]])
            # row norms cancel in argmax; only centroid norms matter
            out[ok] = np.argmax(mat @ cents_unit, axis=1).astype(np.int32)
        return pd.Series(out)

    return df.withColumn("cell", cell_udf(F.col(vec_col)))


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


def knn_join_bruteforce(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs exact kNN join: for EVERY vector, its top-k cosine
    neighbors (self excluded; ties broken by ascending neighbor id).

    Distributed shape — the canonical brute-force kNN join: the index
    side is broadcast once as a dense matrix (fits executor memory up
    to ~1-10 M vectors × dim; beyond that, switch to `topk_ivf`'s
    cell-pruned search), and the probe side streams through in Arrow
    batches doing a batched matrix product + per-row top-k. No
    shuffle: probe partitions never move, each task joins against its
    local copy of the index.

    The dot products accumulate dimension-by-dimension in index order
    (a left fold, matching `functions.vectors.dot` and DuckDB's
    ``list_dot_product``) so the oracle compares bit-for-bit; swapping
    the fold loop for one BLAS gemm is a one-line change that trades
    that reproducibility for ~2× throughput.

    Note the index side materializes EAGERLY, at call time: a PySpark
    broadcast variable must exist before the probe plan can close over
    it, so building this DataFrame runs one collect job. Call it when
    you mean to run it.
    """
    out_schema = f"{id_col} long, neighbor_id long, cos_sim double"
    rows = df.select(id_col, vec_col).collect()
    if not rows:
        return df.sparkSession.createDataFrame([], out_schema)
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.array(
        [[float(v) for v in rows[int(i)][1]] for i in order], dtype=np.float64
    )
    dim = mat.shape[1]

    def _fold_norms(a: np.ndarray) -> np.ndarray:
        acc = np.zeros(a.shape[0])
        for d in range(a.shape[1]):
            acc += a[:, d] * a[:, d]
        return np.sqrt(acc)

    idx_norms = _fold_norms(mat)
    bc = df.sparkSession.sparkContext.broadcast((ids, mat, idx_norms))

    def probe(batches):
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            pids = pdf[id_col].to_numpy()
            pmat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            acc = np.zeros((len(pmat), len(b_ids)))
            for d in range(dim):
                acc += np.multiply.outer(pmat[:, d], b_mat[:, d])
            cos = acc / (_fold_norms(pmat)[:, None] * b_norms[None, :])
            out_q, out_n, out_c = [], [], []
            for i in range(len(pids)):
                row = cos[i].copy()
                self_mask = b_ids == pids[i]
                row[self_mask] = -np.inf
                # primary: cos desc; tie: neighbor id asc
                top = np.lexsort((b_ids, -row))[:k]
                out_q.append(np.full(len(top), pids[i], dtype=np.int64))
                out_n.append(b_ids[top])
                out_c.append(cos[i][top])
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cos_sim": np.concatenate(out_c),
                }
            )

    return ensure_parallelism(df).select(id_col, vec_col).mapInPandas(
        probe, out_schema
    )


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
