"""Count-min sketch for heavy-hitter detection (SURVEY.md §2.10 scale
path, sketch family alongside HLL and the Bloom filter).

A CMS is a d×w counter matrix: each key increments one counter per row
(double hashing picks the column), an estimate reads the MIN across
rows. Estimates only ever OVER-count (collisions add, never subtract),
which is the property the heavy-hitters operator leans on: probing the
sketch yields a candidate superset with no false negatives, and an
exact count over the (small) candidate subset removes the false
positives — so the two-tier output equals the exact GROUP BY / HAVING
bit-for-bit while touching only sketch-sized state.

Construction mirrors functions/bloom.py: each partition folds its keys
into a LOCAL matrix (numpy, one pass), emits only its nonzero cells,
and a SUM aggregation merges partials — CMS matrices are additive. The
driver receives at most d·w cells (model-size, ~256 KB at the default
4×8192), never a key set.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# splitmix64 constants — the standard 64-bit finalizer, vectorizable
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x + _SM_GAMMA).astype(np.uint64)
    z = ((z ^ (z >> np.uint64(30))) * _SM_M1).astype(np.uint64)
    z = ((z ^ (z >> np.uint64(27))) * _SM_M2).astype(np.uint64)
    return (z ^ (z >> np.uint64(31))).astype(np.uint64)


def _hash_pair(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two decorrelated 64-bit streams per int64 key (Kirsch-
    Mitzenmacher double hashing: col_i = h1 + i*h2 mod w)."""
    k = keys.astype(np.int64).view(np.uint64)
    h1 = _splitmix64(k)
    h2 = _splitmix64(k ^ _SM_GAMMA) | np.uint64(1)
    return h1, h2


@dataclass(frozen=True)
class CountMin:
    counts: np.ndarray  # (d, w) int64
    d: int
    w: int

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized point estimates (≥ true count, never below)."""
        if len(keys) == 0:
            return np.zeros(0, dtype=np.int64)
        h1, h2 = _hash_pair(np.asarray(keys))
        est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
        w = np.uint64(self.w)
        for i in range(self.d):
            col = ((h1 + np.uint64(i) * h2) % w).astype(np.int64)
            est = np.minimum(est, self.counts[i, col])
        return est


def cms_width_for(
    total: int,
    threshold: int,
    w_min: int = 1024,
    w_max: int = 1 << 22,
) -> int:
    """Data-derived CMS width for heavy-hitter detection.

    The expected collision mass landing on any counter is total/w, so a
    key's over-count is ~total/w per row (the min over d rows only
    helps). Keeping that at or below threshold/4 (w >= 4*total/
    threshold) means only keys within ~25% of the threshold can become
    false-positive candidates — the candidate set stays a small
    multiple of the true heavy-hitter set instead of approaching all
    keys, which is what a fixed w does as data grows. Width snaps to a
    power of two in [w_min, w_max]; at the cap (4M counters, 128 MB at
    d=4) the superset guarantee degrades gracefully and the exact
    verify pass still removes every false positive — only its input
    grows. Mirrors the data-derived sizing of the bloom build
    (functions/bloom.py)."""
    target = max(w_min, int(np.ceil(4 * total / max(threshold, 1))))
    w = 1 << int(np.ceil(np.log2(target)))
    return min(w, w_max)


def build_cms_distributed(
    df, col: str, d: int = 4, w: int = 8192
) -> CountMin:
    """Distributed CMS over an int64 key column: partition-local
    matrices, nonzero cells SUM-merged, driver gets ≤ d·w cells."""
    import pandas as pd
    from pyspark.sql import functions as F

    def fold(batches):
        local = np.zeros((d, w), dtype=np.int64)
        for pdf in batches:
            keys = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            if not len(keys):
                continue
            h1, h2 = _hash_pair(keys)
            for i in range(d):
                col_idx = ((h1 + np.uint64(i) * h2) % np.uint64(w)).astype(
                    np.int64
                )
                np.add.at(local[i], col_idx, 1)
        r, c = np.nonzero(local)
        yield pd.DataFrame(
            {
                "cell": (r * w + c).astype("int64"),
                "cnt": local[r, c].astype("int64"),
            }
        )

    rows = (
        df.select(F.col(col).cast("long"))
        .mapInPandas(fold, "cell long, cnt long")
        .groupBy("cell")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    counts = np.zeros((d, w), dtype=np.int64)
    for rrow in rows:
        counts[rrow["cell"] // w, rrow["cell"] % w] = rrow["cnt"]
    return CountMin(counts=counts, d=d, w=w)
