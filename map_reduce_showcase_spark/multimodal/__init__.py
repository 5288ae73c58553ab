from .binary_cols import (
    MEDIA_META_SCHEMA,
    decode_media_meta,
    extract_frames,
    to_media_frame,
)

__all__ = [
    "MEDIA_META_SCHEMA",
    "to_media_frame",
    "decode_media_meta",
    "extract_frames",
]
