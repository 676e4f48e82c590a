"""Product quantization (PQ) — the compression tier of the ANN family
(SURVEY.md §2.10 L3; Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

IVF narrows the search to a few cells; PQ shrinks what gets scanned
inside them: each d-dim vector is split into ``m`` subspaces and each
sub-vector replaced by the index of its nearest per-subspace centroid.
At d=64 / m=8 / k=16 a vector is 8 small codes instead of 64 floats —
the memory cut that lets billion-vector indexes live in RAM. Query
scoring is ADC (asymmetric distance computation): ONE m×k lookup
table of exact query-to-centroid squared distances per query, then
each candidate costs m table lookups instead of d multiplies.

Scale shape mirrors the coarse quantizer's:

- **train** — per-subspace Lloyd reusing :func:`kmeans_centroids` on a
  sliced view of the corpus (``F.slice`` is a JVM projection; the m
  small k-means runs share its distributed assign/update machinery and
  its ``fit_fraction`` sampling knob). Only the (m, k, d/m) codebook —
  ~1k floats regardless of corpus size — ever reaches the driver.
- **encode / score** — Arrow-vectorized pandas UDFs over numpy
  matmuls; no per-row Python, nothing collected.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .kmeans import kmeans_centroids


def train_pq(
    df: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
) -> np.ndarray:
    """Per-subspace codebooks, shape (m, k, dim//m).

    ``dim`` must be divisible by ``m``; each subspace trains an
    independent k-means over the corpus's sliced sub-vectors
    (deterministic first-k init, fixed iteration count — same
    convergence contract as the coarse quantizer).
    """
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for s in range(m):
        sub = df.select(
            F.col(id_col).alias(id_col),
            F.slice(F.col(vec_col), s * dsub + 1, dsub).alias(vec_col),
        )
        books.append(
            np.asarray(
                kmeans_centroids(
                    sub, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
                    fit_fraction=fit_fraction,
                ),
                dtype=np.float64,
            )
        )
    return np.stack(books)


def encode_pq(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes) — each vector replaced by its m nearest-centroid
    indices. The codebook ships to executors inside the UDF closure
    (a few KB); the argmin is one (batch × k) matmul per subspace."""
    m, _, dsub = codebooks.shape
    cb = codebooks

    @pandas_udf("array<int>")
    def codes_udf(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = np.empty((mat.shape[0], m), dtype=np.int32)
        for s in range(m):
            x = mat[:, s * dsub : (s + 1) * dsub]
            # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² is rank-free
            d2 = -2.0 * (x @ cb[s].T) + (cb[s] ** 2).sum(axis=1)[None, :]
            codes[:, s] = d2.argmin(axis=1)
        return pd.Series(list(codes.tolist()))

    return df.select(id_col, codes_udf(vec_col).alias("codes"))


def topk_pq(
    codes_df: DataFrame,
    query: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the encoded corpus: build the query's m×k exact
    distance table once, score every code row with m lookups, global
    top-k via TakeOrdered (no full sort)."""
    m, _, dsub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    lut = np.stack(
        [
            ((q[s * dsub : (s + 1) * dsub][None, :] - codebooks[s]) ** 2).sum(
                axis=1
            )
            for s in range(m)
        ]
    )

    @pandas_udf("double")
    def adc_udf(codes: pd.Series) -> pd.Series:
        c = np.stack([np.asarray(v, dtype=np.int64) for v in codes])
        return pd.Series(lut[np.arange(m)[None, :], c].sum(axis=1))

    return (
        codes_df.select(id_col, adc_udf("codes").alias("approx_dist"))
        .orderBy(F.asc("approx_dist"), F.asc(id_col))
        .limit(k)
    )
