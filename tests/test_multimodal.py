"""Multimodal plumbing tests (SURVEY.md §2.10 L5): metadata stays
JVM-side, the stub codec's Arrow batch shape is real, frame fan-out
explodes rows correctly."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from outreach_etl_tool_spark.multimodal import (
    decode_features,
    frame_sample,
    with_media_meta,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"fakepixels" * 10
JPG = b"\xff\xd8\xff\xe0" + b"jfif" * 25
# a REAL minimal PCM16 WAV — since the WAVE-tag sniff refinement, a
# bare RIFF prefix without the tag is (correctly) application/riff
def _wav_bytes() -> bytes:
    import numpy as np

    from outreach_etl_tool_spark.multimodal.wav import encode_wav

    return encode_wav(np.zeros((40, 1), dtype=np.int16), 8000)


WAV = _wav_bytes()
RAW = b"justbytes" * 11


@pytest.fixture(scope="module")
def assets(spark):
    rows = [(1, PNG), (2, JPG), (3, WAV), (4, RAW)]
    return spark.createDataFrame(rows, "asset_id long, payload binary")


def test_media_meta_jvm_side(spark, assets):
    out = with_media_meta(assets)
    got = {r["asset_id"]: r for r in out.collect()}
    assert got[1]["media_type"] == "image/png"
    assert got[2]["media_type"] == "image/jpeg"
    assert got[3]["media_type"] == "audio/wav"
    assert got[4]["media_type"] == "application/octet-stream"
    assert got[1]["media_len"] == len(PNG)
    assert got[2]["media_sha256"] == hashlib.sha256(JPG).hexdigest()
    # no Python execution: the plan must be free of UDF/Arrow stages
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_decode_features_shape(spark, assets):
    out = decode_features(assets, bins=16)
    rows = {r["asset_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    for r in rows.values():
        assert len(r["feature"]) == 16
        assert abs(sum(r["feature"]) - 1.0) < 1e-9  # normalized histogram
    assert rows[1]["media_type"] == "image/png"
    assert rows[1]["n_bytes"] == len(PNG)


def test_decode_features_deterministic(spark, assets):
    a = decode_features(assets).orderBy("asset_id").collect()
    b = decode_features(assets).orderBy("asset_id").collect()
    assert a == b


def test_frame_sample_fanout(spark, assets):
    out = frame_sample(assets, frame_bytes=32, every_nth=2)
    got = out.groupBy("asset_id").agg(
        F.count("*").alias("n"), F.max("frame_idx").alias("max_idx")
    ).collect()
    by_id = {r["asset_id"]: r for r in got}
    # PNG is 108 bytes → 4 frames of 32 → indices 0,2 kept
    n_png = (len(PNG) + 31) // 32
    assert by_id[1]["n"] == (n_png + 1) // 2
    assert by_id[1]["max_idx"] == 2
    # frame payloads are the right windows
    f0 = out.filter((F.col("asset_id") == 1) & (F.col("frame_idx") == 0)).collect()[0]
    assert bytes(f0["frame"]) == PNG[:32]


def test_resize_block_mean_exact(spark):
    """A 16x16 gradient downsampled to 8x8: each output pixel is the
    mean of its 2x2 block; short payloads yield 0x0 + null pixels."""
    import numpy as np
    from outreach_etl_tool_spark.multimodal import resize_images

    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    rows = [(1, bytes(img.tobytes())), (2, b"tiny")]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r["asset_id"]: r for r in resize_images(df, out_w=8, out_h=8).collect()}

    assert (got[2]["width"], got[2]["height"], got[2]["pixels"]) == (0, 0, None)
    assert (got[1]["width"], got[1]["height"]) == (8, 8)
    expected = (
        img.reshape(8, 2, 8, 2).mean(axis=(1, 3)).astype(np.uint8).tobytes()
    )
    assert bytes(got[1]["pixels"]) == expected


# ------------------------------------------------------- perceptual hash
def _grid_payload(rng_seed: int, side: int = 32, flip: int = 0) -> bytes:
    """Deterministic fake 'image': side×side uint8 grid; optionally
    flip a few bytes to simulate a near-duplicate."""
    import numpy as np

    rng = np.random.RandomState(rng_seed)
    # seed-dependent block structure: each 8x8-downsample block is
    # biased dark or bright by the seed's coin flips, so different
    # seeds produce far-apart hashes (unlike a shared global pattern)
    dark = rng.rand(8, 8) < 0.5
    a = rng.randint(0, 256, size=(side, side), dtype=np.uint8)
    bh = side // 8
    for i in range(8):
        for j in range(8):
            if dark[i, j]:
                a[i * bh:(i + 1) * bh, j * bh:(j + 1) * bh] //= 4
    a = a.reshape(-1).copy()
    if flip:
        a[:flip] = 255
    return a.tobytes()


def test_ahash_identical_payloads_collide(spark):
    from outreach_etl_tool_spark.multimodal.phash import ahash_images

    p = _grid_payload(1)
    df = spark.createDataFrame(
        [(1, bytearray(p)), (2, bytearray(p))],
        "asset_id long, payload binary",
    )
    got = {r["asset_id"]: r["phash"] for r in ahash_images(df).collect()}
    assert got[1] == got[2]


def test_phash_near_dup_pairs(spark):
    """Identical images pair at Hamming 0; a lightly-perturbed copy
    pairs within the band guarantee; unrelated images do not pair."""
    from outreach_etl_tool_spark.multimodal.phash import phash_near_dup

    base = _grid_payload(7)
    near = _grid_payload(7, flip=8)       # tiny corner perturbation
    other = _grid_payload(99)
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(base)),
         (3, bytearray(near)), (4, bytearray(other))],
        "asset_id long, payload binary",
    )
    rows = phash_near_dup(df, max_hamming=3).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert pairs[(1, 2)] == 0
    assert all(b != 4 and a != 4 for a, b in pairs)
    # the perturbed copy pairs with at least one of the identical two
    assert any(3 in p for p in pairs), pairs


def test_phash_skips_undecodable_assets(spark):
    from outreach_etl_tool_spark.multimodal.phash import ahash_images

    df = spark.createDataFrame(
        [(1, bytearray(b"tiny")), (2, bytearray(_grid_payload(3)))],
        "asset_id long, payload binary",
    )
    got = ahash_images(df).collect()
    assert [r["asset_id"] for r in got] == [2]


def test_ppm_codec_roundtrip_identity():
    """encode→decode is the identity for any uint8 image, including
    non-square geometry."""
    import numpy as np

    from outreach_etl_tool_spark.multimodal.ppm import decode_ppm, encode_ppm

    rng = np.random.RandomState(11)
    for h, w in [(1, 1), (7, 13), (12, 23)]:
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_ppm(encode_ppm(img))
        assert out.shape == (h, w, 3)
        assert (out == img).all()


def test_ppm_decode_header_grammar_and_errors():
    import numpy as np
    import pytest as _pytest

    from outreach_etl_tool_spark.multimodal.ppm import decode_ppm

    raster = bytes(range(2 * 3 * 3))  # 2x3 image, 18 bytes
    # comments and arbitrary whitespace inside the header are legal
    buf = b"P6 # a comment\n  3\t# another\n 2 \n255\n" + raster
    img = decode_ppm(buf)
    assert img.shape == (2, 3, 3)
    assert img.tobytes() == raster

    with _pytest.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with _pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00")
    with _pytest.raises(ValueError, match="truncated PPM raster"):
        decode_ppm(b"P6\n4 4\n255\n\x00\x00")


def test_ppm_magic_sniffed(spark):
    from outreach_etl_tool_spark.multimodal import with_media_meta
    from outreach_etl_tool_spark.multimodal.ppm import encode_ppm
    import numpy as np

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(img)))], "asset_id long, payload binary"
    )
    row = with_media_meta(df).first()
    assert row["media_type"] == "image/x-portable-pixmap"


def test_ppm_decode_rejects_negative_dimensions():
    import pytest as _pytest

    from outreach_etl_tool_spark.multimodal.ppm import decode_ppm

    with _pytest.raises(ValueError, match="invalid PPM dimensions"):
        decode_ppm(b"P6 -1 4 255\n" + bytes(24))
    with _pytest.raises(ValueError, match="invalid PPM dimensions"):
        decode_ppm(b"P6 3 0 255\n")


def test_ppm_magic_requires_whitespace(spark):
    """A bare 'P6xx' prefix must NOT be classified as PPM — the spec
    requires whitespace after the magic, and the sniffer now feeds a
    real decoder."""
    from outreach_etl_tool_spark.multimodal import with_media_meta

    df = spark.createDataFrame(
        [(1, bytearray(b"P6garbage-not-an-image"))],
        "asset_id long, payload binary",
    )
    assert with_media_meta(df).first()["media_type"] == "application/octet-stream"


def test_decode_features_uses_real_codecs_for_ppm_and_wav(spark):
    """PPM and WAV payloads must be featured from DECODED content
    (pixel / sample histograms), not raw file bytes; the WAVE-tag
    refinement keeps non-WAV RIFF containers off the audio path."""
    import numpy as np

    from outreach_etl_tool_spark.multimodal.ppm import encode_ppm
    from outreach_etl_tool_spark.multimodal.wav import encode_wav

    img = np.zeros((4, 4, 3), dtype=np.uint8)          # all pixels 0
    wav = encode_wav(np.full((64, 1), 20000, dtype=np.int16), 8000)
    avi = b"RIFF" + b"\x10\x00\x00\x00" + b"AVI " + b"\x00" * 16
    assets = spark.createDataFrame(
        [(1, bytearray(encode_ppm(img))), (2, bytearray(wav)),
         (3, bytearray(avi))],
        "asset_id long, payload binary",
    )
    rows = {r["asset_id"]: r for r in decode_features(assets).collect()}
    assert rows[1]["media_type"] == "image/x-portable-pixmap"
    # decoded pixels are all zero → first histogram bin holds all mass
    # (the raw-bytes stub would put header bytes in higher bins)
    assert rows[1]["feature"][0] == 1.0
    assert rows[2]["media_type"] == "audio/wav"
    # all samples = 20000 → exactly one nonzero bin at 20000's bucket
    feat = rows[2]["feature"]
    assert feat[(20000 + 32768) * 16 // 65536] == 1.0 and sum(feat) == 1.0
    assert rows[3]["media_type"] == "application/riff"


def test_resize_decodes_real_ppm_pixels(spark):
    """A PPM payload resizes from DECODED pixels: 2x2 block-mean of a
    known 16x16 RGB gradient, interleaved RGB out (stub path unchanged
    for non-PPM payloads)."""
    import numpy as np

    from outreach_etl_tool_spark.multimodal import resize_images
    from outreach_etl_tool_spark.multimodal.ppm import encode_ppm

    y, x = np.mgrid[0:16, 0:16]
    img = np.stack([(x * 16) % 256, (y * 16) % 256,
                    np.full_like(x, 7)], axis=-1).astype(np.uint8)
    assets = spark.createDataFrame(
        [(1, bytearray(encode_ppm(img)))], "asset_id long, payload binary"
    )
    (row,) = resize_images(assets, out_w=8, out_h=8).collect()
    assert (row["width"], row["height"]) == (8, 8)
    got = np.frombuffer(bytes(row["pixels"]), dtype=np.uint8).reshape(8, 8, 3)
    expect = (
        img.reshape(8, 2, 8, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
    )
    assert (got == expect).all()


# ------------------------------------------- optional Pillow codec path
def _png_bytes(img):
    """Encode an RGB numpy array as PNG via Pillow (caller skip-gates)."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img, mode="RGB").save(buf, format="PNG")
    return buf.getvalue()


def test_png_decode_features_real_pixels_when_pillow_present(spark):
    """With Pillow importable, PNG features come from the DECODED
    pixels (lossless roundtrip → histogram computable analytically),
    not the compressed byte stream."""
    import numpy as np
    import pytest

    pytest.importorskip("PIL")
    from outreach_etl_tool_spark.multimodal import decode_features

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    assets = spark.createDataFrame(
        [(1, bytearray(_png_bytes(img)))], "asset_id long, payload binary"
    )
    (row,) = decode_features(assets).collect()
    assert row["media_type"] == "image/png"
    px = img.reshape(-1)
    hist, _ = np.histogram(px, bins=16, range=(0, 256))
    expect = hist / px.size
    assert np.allclose(row["feature"], expect)


def test_png_resize_block_mean_when_pillow_present(spark):
    import numpy as np
    import pytest

    pytest.importorskip("PIL")
    from outreach_etl_tool_spark.multimodal import resize_images

    y, x = np.mgrid[0:16, 0:16]
    img = np.stack([(x * 16) % 256, (y * 16) % 256,
                    np.full_like(x, 9)], axis=-1).astype(np.uint8)
    assets = spark.createDataFrame(
        [(1, bytearray(_png_bytes(img)))], "asset_id long, payload binary"
    )
    (row,) = resize_images(assets, out_w=8, out_h=8).collect()
    assert (row["width"], row["height"]) == (8, 8)
    got = np.frombuffer(bytes(row["pixels"]), dtype=np.uint8).reshape(8, 8, 3)
    expect = img.reshape(8, 2, 8, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
    assert (got == expect).all()


def test_png_without_pillow_keeps_deterministic_stub(spark):
    """Pillow absent → PNG payloads take the byte-histogram stub, and
    the pipeline stays deterministic (this is the path this container
    exercises; the two tests above cover the Pillow branch)."""
    import numpy as np

    from outreach_etl_tool_spark.multimodal import decode_features
    from outreach_etl_tool_spark.multimodal.media import _pil_available

    png_magic = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
    assets = spark.createDataFrame(
        [(1, bytearray(png_magic))], "asset_id long, payload binary"
    )
    (row,) = decode_features(assets).collect()
    assert row["media_type"] == "image/png"
    if not _pil_available():
        arr = np.frombuffer(png_magic, dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=16, range=(0, 256))
        assert np.allclose(row["feature"], hist / arr.size)


# ---------------------------------------------------------------------------
# multimodal_decode_check: the certificate's violation legs are live
# detectors (adversarial negative tests, same pattern as the IVF
# certificates in test_dedup.py).
# ---------------------------------------------------------------------------
def test_multimodal_check_detects_hist_tamper(spark, monkeypatch):
    import outreach_etl_tool_spark.queries.udfs as U
    from pyspark.sql import functions as F

    real = U.multimodal_decode

    def tampered(spark_, sf_dir):
        return real(spark_, sf_dir).withColumn(
            "hist_entropy", F.col("hist_entropy") + F.lit(1e-9)
        )

    monkeypatch.setattr(U, "multimodal_decode", tampered)
    row = U.multimodal_decode_check(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_hist_mismatch"] >= 1


def test_multimodal_check_detects_resize_tamper(spark, monkeypatch):
    import outreach_etl_tool_spark.queries.udfs as U
    from pyspark.sql import functions as F

    real = U.multimodal_resize

    def tampered(spark_, sf_dir):
        return real(spark_, sf_dir).withColumn(
            "width", F.when(F.col("width") == 8, 7).otherwise(F.col("width"))
        )

    monkeypatch.setattr(U, "multimodal_resize", tampered)
    row = U.multimodal_decode_check(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_resize_shape_violations"] >= 1


def test_multimodal_check_detects_frame_drop(spark, monkeypatch):
    """Dropping every 3rd frame breaks the exact count/index/byte
    accounting for some assets."""
    import outreach_etl_tool_spark.queries.udfs as U
    from pyspark.sql import functions as F

    real = U.frame_sample

    def tampered(df, **kw):
        return real(df, **kw).filter(F.col("frame_idx") != 2)

    monkeypatch.setattr(U, "frame_sample", tampered)
    row = U.multimodal_decode_check(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_frame_accounting_violations"] >= 1


# ---------------------------------------------------------------------------
# Audio near-dup fingerprint (round-12): independent python replica of
# the integer kernel, planted-duplicate recall, and entropy floor.
# ---------------------------------------------------------------------------
def _afp_replica(aid: int) -> int:
    """Independent formulation (plain loops, no numpy, no shared
    helpers) of clip synthesis + fingerprint."""
    pert = aid % 10 == 1
    b = aid - 1 if pert else aid
    x = []
    for i in range(992):
        s = i // 32
        t = b * 97 + s
        amp = (t * t + 3 * t) % 1000003 % 97
        st = 1 + 2 * ((t * t * 5 + t * 11) % 1000003 % 32)
        v = amp * ((i * st + b) % 64 - 32)
        if pert and i % 127 == 0:
            v += 1
        x.append(v)
    fp = 0
    energies = [sum(abs(v) for v in x[s * 32:(s + 1) * 32]) for s in range(31)]
    total = sum(energies)
    for s in range(31):
        if energies[s] * 31 > total:
            fp |= 1 << s
        a = sum(
            x[s * 32 + j] * x[s * 32 + j + 1] for j in range(31)
        )
        if a > 0:
            fp |= 1 << (31 + s)
    return fp


def test_audio_fingerprint_matches_python_replica():
    import numpy as np

    from outreach_etl_tool_spark.multimodal.afp import (
        audio_fingerprint,
        synth_clip,
    )
    from outreach_etl_tool_spark.multimodal.wav import decode_wav, encode_wav

    for aid in list(range(40)) + [497, 498, 499, 1234]:
        clip = synth_clip(aid)
        # the query path rides the real codec: verify transparency too
        dec, sr = decode_wav(encode_wav(clip, 16000))
        assert sr == 16000
        assert np.array_equal(dec[:, 0], clip)
        assert audio_fingerprint(dec[:, 0]) == _afp_replica(aid), aid


def test_audio_near_dup_planted_recall_and_entropy(spark):
    from outreach_etl_tool_spark.queries.udfs import multimodal_audio_fp_dedup

    sf = "/root/testdata/sf0.001"
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in multimodal_audio_fp_dedup(spark, sf).collect()
    }
    import duckdb

    ids = [
        r[0]
        for r in duckdb.connect()
        .execute(f"SELECT doc_id FROM '{sf}/documents.parquet'")
        .fetchall()
    ]
    idset = set(ids)
    planted = {(k, k + 1) for k in idset if k % 10 == 0 and k + 1 in idset}
    assert len(planted) >= 40  # the fixture is non-trivial
    # every planted near-dup is recalled (tiny perturbation -> small
    # hamming; the banded join guarantees recall at <= 3)
    assert planted <= set(pairs)
    assert all(pairs[p] <= 3 for p in planted)
    # precision: the emitted set is dominated by the plants, not noise
    assert len(pairs) <= len(planted) + 10
    # entropy floor: unrelated clips sit far apart
    fps = {
        aid: _afp_replica(aid) for aid in sorted(idset)[:100]
    }
    import itertools

    hd = [
        bin(fps[a] ^ fps[b]).count("1")
        for a, b in itertools.combinations(fps, 2)
        if (a, b) not in planted
    ]
    assert sum(hd) / len(hd) > 20
