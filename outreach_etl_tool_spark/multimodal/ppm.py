"""Real image codec: binary PPM (P6), pure numpy — no external libs.

The multimodal family's decode step has been an honest stub (this
container ships no image libraries), but PPM needs none: the P6
format is a tiny ASCII header (magic, width, height, maxval, with
whitespace/comment separators) followed by raw interleaved RGB bytes.
This module implements the full codec, so the decode → feature path
runs on REAL pixels for PPM payloads while PNG/JPEG stay behind the
documented stub boundary.

Scale: both functions are per-asset numpy kernels called from Arrow
batches (mapInPandas) — payloads never leave the executor, nothing is
collected.
"""

from __future__ import annotations

import numpy as np

_WS = b" \t\r\n\x0b\x0c"


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6) bytes."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3), got {img.shape}")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary PPM (P6) bytes → (h, w, 3) uint8 array.

    Full header grammar: the three integers (width, height, maxval)
    may be separated by any whitespace run and ``#`` comments; exactly
    one whitespace byte separates maxval from the raster.
    """
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(buf) and buf[pos : pos + 1] in _WS:
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and buf[pos : pos + 1] not in _WS:
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        vals.append(int(buf[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = vals
    if w <= 0 or h <= 0:
        # without this, a negative header dimension makes the raster
        # size check vacuous and frombuffer+reshape "succeed" on
        # garbage (negative counts read everything; reshape infers
        # the negative dim)
        raise ValueError(f"invalid PPM dimensions {w}x{h}")
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, maxval={maxval}")
    need = w * h * 3
    if len(buf) - pos < need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos).reshape(
        h, w, 3
    )
