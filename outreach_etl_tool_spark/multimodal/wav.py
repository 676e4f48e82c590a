"""Real audio codec: PCM WAV (RIFF), pure numpy — no external libs.

The audio half of the multimodal family gets the same upgrade the
image half got from the PPM codec (multimodal/ppm.py): 16-bit PCM WAV
is a RIFF container — ``RIFF<size>WAVE`` followed by tagged chunks —
and needs no codec library. This module implements the full chunk
grammar: a canonical ``fmt `` + ``data`` writer, and a reader that
walks arbitrary chunk layouts (unknown chunks skipped, odd-size
chunks padded per spec) and validates the PCM16 contract, so the
decode → feature path runs on REAL samples for WAV payloads while
MP3/AAC stay behind the documented stub boundary.

Scale: both functions are per-asset numpy kernels called from Arrow
batches (mapInPandas) — payloads never leave the executor, nothing is
collected.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 samples → PCM16 WAV bytes (canonical
    44-byte header, little-endian interleaved frames)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"expected (n,) or (n, ch), got {samples.shape}")
    if sample_rate <= 0:
        raise ValueError(f"sample_rate must be positive, got {sample_rate}")
    n, ch = samples.shape
    if ch < 1 or ch > 64:
        raise ValueError(f"unsupported channel count {ch}")
    data = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    block_align = ch * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack(
            "<IHHIIHH",
            16, 1, ch, sample_rate, sample_rate * block_align, block_align, 16,
        )
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes → ((n, ch) int16 samples, sample_rate).

    Full RIFF walk: chunks in any order, unknown chunks (LIST, fact,
    …) skipped, odd-sized chunks consume their spec-mandated pad
    byte. Non-PCM / non-16-bit payloads and truncated or inconsistent
    structures raise instead of returning garbage.
    """
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # odd chunks carry one pad byte
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, ch, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"only PCM16 supported (format={audio_format}, bits={bits})"
        )
    if ch < 1 or block_align != ch * 2:
        raise ValueError(f"inconsistent fmt: ch={ch}, align={block_align}")
    if len(data) % block_align:
        raise ValueError("data chunk is not a whole number of frames")
    samples = np.frombuffer(data, dtype="<i2").reshape(-1, ch)
    return samples, sample_rate
