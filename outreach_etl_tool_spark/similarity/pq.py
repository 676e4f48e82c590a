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

- **train** — ALL m subspace k-means run jointly: the corpus explodes
  to (subspace, sub-vector) rows once, and each Lloyd iteration is ONE
  distributed assign + per-(subspace, cell) mean job — not m separate
  k-means (the sequential form cost m× the scheduling and scans;
  measured 17 s → ~5 s at the gate sf). Only the (m, k, d/m) codebook —
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

    ``dim`` must be divisible by ``m``. Deterministic first-k-ids
    init (the same contract as the coarse quantizer), fixed iteration
    count, empty cells keep their previous centroid. ``fit_fraction``
    subsamples the corpus for the build (seeded, reproducible).
    """
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m

    fit = df.select(id_col, vec_col).filter(F.col(vec_col).isNotNull())
    if fit_fraction is not None:
        fit = fit.sample(fraction=fit_fraction, seed=7)

    # init: slices of the first k vectors — one tiny TakeOrdered job
    seed_rows = fit.orderBy(id_col).limit(k).collect()
    if len(seed_rows) < k:
        raise ValueError(f"need ≥{k} vectors to train, got {len(seed_rows)}")
    seeds = np.asarray(
        [list(r[vec_col]) for r in seed_rows], dtype=np.float64
    )  # (k, dim)
    cents = np.stack(
        [seeds[:, s * dsub : (s + 1) * dsub] for s in range(m)]
    )  # (m, k, dsub)

    # corpus → (subspace, sub-vector) rows, built once and reused per
    # iteration; narrow (same total floats as the input column)
    subs = fit.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice(F.col(vec_col), s * dsub + 1, dsub).alias("v"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("e"),
    ).select("id", "e.sub", "e.v").persist()

    mean_schema = "sub int, cell int, mean array<double>, n long"

    def _mean_of_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # rows arrive in shuffle-fetch order, which varies run to run;
        # float addition is non-associative, so sort by id first to
        # keep the trained codebook bit-stable (same ordering contract
        # as ann.py's block kernel)
        pdf = pdf.sort_values("id")
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        return pd.DataFrame(
            {
                "sub": [int(pdf["sub"].iloc[0])],
                "cell": [int(pdf["cell"].iloc[0])],
                "mean": [mat.mean(axis=0).tolist()],
                "n": [len(mat)],
            }
        )

    try:
        for _ in range(iters):
            cb = cents  # closure snapshot for this iteration

            @pandas_udf("int")
            def cell_udf(sub: pd.Series, vecs: pd.Series) -> pd.Series:
                mat = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in vecs]
                )
                out = np.empty(len(mat), dtype=np.int32)
                for s in np.unique(sub.to_numpy()):
                    mask = (sub == s).to_numpy()
                    x = mat[mask]
                    d2 = -2.0 * (x @ cb[s].T) + (cb[s] ** 2).sum(axis=1)[
                        None, :
                    ]
                    out[mask] = d2.argmin(axis=1)
                return pd.Series(out)

            rows = (
                subs.withColumn("cell", cell_udf("sub", "v"))
                .groupBy("sub", "cell")
                .applyInPandas(_mean_of_group, mean_schema)
                .collect()  # ≤ m·k rows of model state
            )
            nxt = cents.copy()  # empty cells keep their old centroid
            for r in rows:
                nxt[r["sub"], r["cell"]] = r["mean"]
            if np.allclose(nxt, cents, rtol=0.0, atol=1e-12):
                cents = nxt
                break
            cents = nxt
    finally:
        subs.unpersist()
    return cents


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
