"""Multimodal column handling (SURVEY.md §2.10 L5; BASELINE.json
north star).

Images/audio/video are opaque ``binary`` columns plus typed metadata.
The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, frame-explosion partitioning — is real and tested; the
codec step itself is stubbed (this environment ships no image/audio
libraries): :func:`media.decode_features` computes a deterministic
byte-level feature standing in for pixel decoding, and clearly marks
where PIL/ffmpeg would slot in behind a try-import.
"""

from .media import (
    MEDIA_FEATURE_SCHEMA,
    decode_features,
    frame_sample,
    resize_images,
    sniff_media_type,
    with_media_meta,
)

__all__ = [
    "MEDIA_FEATURE_SCHEMA",
    "with_media_meta",
    "sniff_media_type",
    "decode_features",
    "frame_sample",
    "resize_images",
]
