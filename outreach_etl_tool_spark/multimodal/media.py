"""Binary media columns: metadata, type sniffing, feature extraction,
frame sampling.

Scale design: payloads never leave the executor. Metadata (length,
digest, magic-byte type) is pure JVM expression work inside codegen;
feature extraction moves bytes once through Arrow into a vectorized
numpy kernel (mapInPandas); frame sampling emits multiple rows per
asset from the same batch iterator — Spark's UDTF analog — so a video
table fans out to a frames table without a shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# magic-byte prefixes → media type, sniffed JVM-side (startswith on
# binary); extend as formats are onboarded
_MAGIC: list[tuple[bytes, str]] = [
    # real codec: multimodal/ppm.py — the spec requires whitespace
    # after the magic, so match it too (a bare 2-byte prefix would
    # misroute 1-in-65k random payloads into the decoder)
    (b"P6\n", "image/x-portable-pixmap"),
    (b"P6 ", "image/x-portable-pixmap"),
    (b"P6\t", "image/x-portable-pixmap"),
    (b"P6\r", "image/x-portable-pixmap"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    # RIFF is a container, not a format: audio/wav needs the WAVE tag
    # at offset 8 (an AVI also starts RIFF) — special-cased in both
    # sniffers rather than listed as a bare prefix here
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),  # ftyp boxes start with a size byte run
]


def sniff_media_type(payload: Column | str) -> Column:
    """Magic-byte media-type sniff (JVM-side, no UDF)."""
    c = F.col(payload) if isinstance(payload, str) else payload
    expr = F.lit("application/octet-stream")
    for magic, mtype in reversed(_MAGIC):
        hexpat = magic.hex()
        prefix = F.hex(F.substring(c, 1, len(magic)))
        expr = F.when(prefix == F.lit(hexpat.upper()), F.lit(mtype)).otherwise(expr)
    # RIFF container: WAV iff the WAVE tag sits at offset 8
    riff = F.hex(F.substring(c, 1, 4)) == F.lit(b"RIFF".hex().upper())
    wave = F.hex(F.substring(c, 9, 4)) == F.lit(b"WAVE".hex().upper())
    return (
        F.when(riff & wave, F.lit("audio/wav"))
        .when(riff, F.lit("application/riff"))
        .otherwise(expr)
    )


def with_media_meta(df: DataFrame, payload: str = "payload") -> DataFrame:
    """Attach typed metadata: byte length, SHA-256 digest, sniffed type.
    All JVM expressions — a 100 TB asset scan stays in codegen and only
    reads the column's first bytes plus a streaming digest."""
    return df.withColumns(
        {
            "media_len": F.length(payload),
            "media_sha256": F.sha2(payload, 256),
            "media_type": sniff_media_type(payload),
        }
    )


MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def _byte_histogram(buf: bytes, bins: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decode: the normalized
    byte-value histogram. A real pipeline replaces this with pixel /
    sample statistics after codec decode."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(bins)
    hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
    return hist / arr.size


# Formats Pillow decodes when it is importable; the probe is cached
# per-process (one failed import per executor worker, not per row)
_PIL_FORMATS = frozenset({"image/png", "image/jpeg", "image/gif"})
_PIL_PROBE: list[bool] | None = None


def _pil_available() -> bool:
    global _PIL_PROBE
    if _PIL_PROBE is None:
        try:
            from PIL import Image  # noqa: F401

            _PIL_PROBE = [True]
        except ImportError:
            _PIL_PROBE = [False]
    return _PIL_PROBE[0]


def _pil_decode_rgb(buf: bytes) -> np.ndarray:
    """(h, w, 3) uint8 via Pillow. Raises ValueError on a corrupt
    payload — same contract as decode_ppm (quarantine upstream)."""
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(buf)) as img:
            return np.asarray(img.convert("RGB"))
    except Exception as exc:  # noqa: BLE001 — normalize codec errors
        raise ValueError(f"Pillow decode failed: {exc}") from exc


def _decoded_feature(buf: bytes, mtype: str, bins: int) -> np.ndarray:
    """Per-type feature: REAL decodes for the formats the engine ships
    codecs for, byte-histogram stand-in for the rest.

    - PPM → pure-numpy decode (multimodal/ppm.py), normalized
      histogram of the actual PIXEL bytes (header excluded);
    - WAV → pure-numpy RIFF walk (multimodal/wav.py), normalized
      histogram of the int16 SAMPLE values over [-2^15, 2^15);
    - PNG/JPEG/GIF → real pixel histogram when Pillow is importable
      (optional dependency — not shipped in this container), else the
      deterministic byte-histogram stub;
    - everything else (MP3/MP4 — codecs not shipped) keeps the stub.

    A payload that sniffs as a decodable type but fails its codec
    raises — at scale you quarantine those rows upstream (S3b path),
    not silently re-feature them.
    """
    if mtype in _PIL_FORMATS and _pil_available():
        px = _pil_decode_rgb(buf).reshape(-1)
        hist, _ = np.histogram(px, bins=bins, range=(0, 256))
        return hist / max(px.size, 1)
    if mtype == "image/x-portable-pixmap":
        from .ppm import decode_ppm

        px = decode_ppm(buf).reshape(-1)
        hist, _ = np.histogram(px, bins=bins, range=(0, 256))
        return hist / px.size
    if mtype == "audio/wav":
        from .wav import decode_wav

        samples, _sr = decode_wav(buf)
        flat = samples.reshape(-1).astype(np.int32)
        hist, _ = np.histogram(flat, bins=bins, range=(-32768, 32768))
        return hist / max(flat.size, 1)
    return _byte_histogram(buf, bins)


def decode_features(
    df: DataFrame, id_col: str = "asset_id", payload: str = "payload",
    bins: int = 16,
) -> DataFrame:
    """Feature-extract every asset via Arrow-batched mapInPandas.

    The codec step is REAL for PPM images and PCM WAV audio (pure
    numpy, see ``_decoded_feature``); other formats keep the
    deterministic byte-histogram stand-in until their codecs are
    onboarded (PIL/ffmpeg are not shipped in this environment). The
    batch plumbing (schema, Arrow transfer, per-partition iteration)
    is identical either way.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload]
            mtypes = [_sniff_py(b) for b in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "media_type": mtypes,
                    "n_bytes": payloads.str.len().astype("int64"),
                    "feature": [
                        _decoded_feature(b, t, bins).tolist()
                        for b, t in zip(payloads, mtypes)
                    ],
                }
            )

    return df.select(id_col, payload).mapInPandas(extract, MEDIA_FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    id_col: str = "asset_id",
    payload: str = "payload",
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """Resize every image asset to (out_w × out_h) via Arrow-batched
    mapInPandas — one narrow pass, pixels never shuffle.

    REAL for PPM payloads (pure-numpy decode, per-channel exact
    block-mean downsample, interleaved RGB out); other formats keep
    the stub codec — payload interpreted as a square uint8 grid
    (side = floor(sqrt(n_bytes))), block-mean downsampled — until
    PIL/libvips-class codecs are onboarded behind the same
    (id, payload) → (id, width, height, pixels) signature. Assets too
    small to form one block per output pixel emit width/height 0 and
    null pixels rather than failing the batch; a corrupt PPM payload
    does the same (quarantine upstream is the scale path).
    """
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pixels", T.BinaryType()),
        ]
    )

    def _fake_decode(buf: bytes) -> np.ndarray | None:
        side = int(np.sqrt(len(buf)))
        if side < max(out_w, out_h):
            return None
        a = np.frombuffer(buf[: side * side], dtype=np.uint8)
        return a.reshape(side, side, 1)

    def _decode(buf: bytes) -> np.ndarray | None:
        """(h, w, ch) uint8 — REAL pixels for PPM always and for
        PNG/JPEG/GIF when Pillow is importable; stub grid otherwise.
        Corrupt payloads of a decodable type yield None (the batch
        survives; quarantine upstream)."""
        mtype = _sniff_py(buf)
        if mtype == "image/x-portable-pixmap":
            from .ppm import decode_ppm

            try:
                return decode_ppm(buf)
            except ValueError:
                return None
        if mtype in _PIL_FORMATS and _pil_available():
            try:
                return _pil_decode_rgb(buf)
            except ValueError:
                return None
        return _fake_decode(buf)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            ws: list[int] = []
            hs: list[int] = []
            px: list[bytes | None] = []
            for aid, buf in zip(pdf[id_col], pdf[payload]):
                img = _decode(bytes(buf))
                ids.append(int(aid))
                bh = bw = 0
                if img is not None:
                    h, w = img.shape[:2]
                    bh, bw = h // out_h, w // out_w
                if img is None or bh < 1 or bw < 1:
                    ws.append(0); hs.append(0); px.append(None)
                    continue
                # block-mean per channel: crop to a multiple of the
                # target, reshape (h, bh, w, bw, ch), mean the blocks
                ch = img.shape[2]
                crop = img[: bh * out_h, : bw * out_w]
                small = (
                    crop.reshape(out_h, bh, out_w, bw, ch)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                ws.append(out_w); hs.append(out_h)
                px.append(small.tobytes())
            yield pd.DataFrame(
                {"asset_id": pd.Series(ids, dtype="int64"),
                 "width": pd.Series(ws, dtype="int32"),
                 "height": pd.Series(hs, dtype="int32"),
                 "pixels": px}
            )

    return df.select(id_col, payload).mapInPandas(resize, schema)


def _sniff_py(buf: bytes) -> str:
    if buf.startswith(b"RIFF"):
        return "audio/wav" if buf[8:12] == b"WAVE" else "application/riff"
    for magic, mtype in _MAGIC:
        if buf.startswith(magic):
            return mtype
    return "application/octet-stream"


def frame_sample(
    df: DataFrame,
    id_col: str = "asset_id",
    payload: str = "payload",
    frame_bytes: int = 256,
    every_nth: int = 2,
) -> DataFrame:
    """Sample fixed-size frames from each asset — one output row per
    kept frame (UDTF-shaped fan-out, no shuffle).

    STUB: frames are fixed-byte windows; a real video pipeline replaces
    the windowing with container demux + keyframe extraction, keeping
    this exact row-explosion shape.
    """
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for aid, buf in zip(pdf[id_col], pdf[payload]):
                n_frames = max(1, (len(buf) + frame_bytes - 1) // frame_bytes)
                for k in range(0, n_frames, every_nth):
                    ids.append(int(aid))
                    idxs.append(k)
                    frames.append(bytes(buf[k * frame_bytes:(k + 1) * frame_bytes]))
            yield pd.DataFrame(
                {"asset_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int64"),
                 "frame": frames}
            )

    return df.select(id_col, payload).mapInPandas(sample, schema)
