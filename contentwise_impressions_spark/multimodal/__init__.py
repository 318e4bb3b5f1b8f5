from .binary_ops import (
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_media,
    extract_features,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "decode_media",
    "extract_features",
    "sample_frames",
]
