from .binary_ops import (
    MEDIA_SCHEMA,
    attach_fake_media,
    attach_generated_audio,
    attach_generated_media,
    attach_generated_video,
    decode_audio,
    decode_media,
    encode_ppm,
    encode_wav,
    extract_features,
    resize_media,
    sample_frames,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "attach_generated_audio",
    "attach_generated_media",
    "attach_generated_video",
    "decode_audio",
    "decode_media",
    "encode_ppm",
    "encode_wav",
    "extract_features",
    "resize_media",
    "sample_frames",
]
