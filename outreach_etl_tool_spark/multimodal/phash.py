"""Perceptual-hash image near-dup (SURVEY.md §2.10 L5 × L2).

Average-hash (aHash): resize to 8×8 (the existing block-mean pipeline —
stub codec, real plumbing), set bit i when pixel_i exceeds the image
mean, pack to one 64-bit fingerprint. Visually-near-identical images
differ in a few bits, so candidate generation is the shared 4×16-band
bucket join (`dedup.fingerprint.fingerprint_pairs`) — image bytes ride
exactly one narrow decode pass, then only (id, hash) moves.

A real deployment swaps the stub decode inside `resize_images` for
PIL/libvips; everything downstream of the 8×8 grid — the hash kernel,
banding, verification — is codec-independent and tested here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..dedup.fingerprint import fingerprint_pairs
from .media import resize_images


@F.pandas_udf(T.LongType())
def _ahash64(pixels: pd.Series) -> pd.Series:
    out = [None] * len(pixels)
    ok = [
        i
        for i, buf in enumerate(pixels)
        if buf is not None and len(bytes(buf)) == 64
    ]
    if ok:
        mat = np.stack(
            [np.frombuffer(bytes(pixels.iloc[i]), dtype=np.uint8) for i in ok]
        ).astype(np.float64)
        bits = (mat > mat.mean(axis=1, keepdims=True)).astype(np.uint8)
        packed = np.packbits(bits, axis=1)  # MSB-first, 8 bytes per row
        for j, i in enumerate(ok):
            out[i] = int.from_bytes(packed[j].tobytes(), "big", signed=True)
    return pd.Series(out, dtype="object")


def ahash_images(
    df: DataFrame,
    id_col: str = "asset_id",
    payload: str = "payload",
) -> DataFrame:
    """(asset_id, phash) — null for assets the decoder rejects."""
    small = resize_images(df, id_col=id_col, payload=payload, out_w=8, out_h=8)
    return small.select(
        F.col("asset_id"), _ahash64(F.col("pixels")).alias("phash")
    ).filter(F.col("phash").isNotNull())


def phash_near_dup(
    df: DataFrame,
    id_col: str = "asset_id",
    payload: str = "payload",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate asset pairs by perceptual hash."""
    hashed = ahash_images(df, id_col, payload)
    return fingerprint_pairs(
        hashed, id_col="asset_id", hash_col="phash", max_hamming=max_hamming
    )
