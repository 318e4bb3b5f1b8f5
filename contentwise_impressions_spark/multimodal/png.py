"""Pure-python/numpy baseline PNG codec (8-bit, non-interlaced).

PNG is DEFLATE-compressed filtered scanlines — and ``zlib`` ships with
CPython, so unlike mp3/mp4 this container CAN decode it for real: chunk
walk (CRC-validated) → IHDR → concatenated IDAT inflate → per-row
unfilter (all five filter types: None/Sub/Up/Average/Paeth, RFC 2083
§6) → raster.  Color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+α),
6 (RGBA) at bit depth 8.

``encode_png`` is the fixture twin (same role as
``multimodal/jpeg.encode_jpeg``): it emits real spec-conformant files,
with ``filter_mode="cycle"`` rotating the row filter through all five
types so a single roundtrip exercises every decoder unfilter path.

Reference-parity note: the reference has no image codecs at all (its
multimodal surface is out of scope for a CF engine); this exists for the
training-data-pipeline extension, same contract as decode_jpeg.
"""

from __future__ import annotations

import struct
import sys
import zlib

import numpy as np

try:  # by-value pickling: executors need no PYTHONPATH (see slim.py note)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per color type (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(tag + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(img: np.ndarray, filter_mode: str = "none") -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 → PNG bytes.

    `filter_mode`: "none" (filter 0 everywhere) or "cycle" (row r uses
    filter r % 5 — exercises every decoder unfilter path losslessly).
    """
    a = np.asarray(img, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    ctype = 0 if gray else 2
    raw = a.reshape(h, -1).astype(np.int64)  # rows of w*channels bytes
    bpp = 1 if gray else 3
    lines = bytearray()
    prev = np.zeros(raw.shape[1], dtype=np.int64)
    for r in range(h):
        row = raw[r]
        ft = 0 if filter_mode == "none" else r % 5
        if ft == 0:
            flt = row
        elif ft == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            flt = row - left
        elif ft == 2:  # Up
            flt = row - prev
        elif ft == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            flt = row - (left + prev) // 2
        else:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
            flt = row.copy()
            for i in range(len(row)):
                flt[i] = row[i] - _paeth(
                    int(left[i]), int(prev[i]), int(upleft[i])
                )
        lines.append(ft)
        lines += (flt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) gray or (h, w, C) for C in 2/3/4."""
    b = bytes(buf)
    if b[:8] != _SIG:
        raise ValueError("not a PNG file (bad signature)")
    i = 8
    w = h = None
    ctype = depth = 0
    palette: np.ndarray | None = None
    idat = bytearray()
    while i + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[i : i + 4])
        tag = b[i + 4 : i + 8]
        body = b[i + 8 : i + 8 + ln]
        if i + 12 + ln > len(b):
            raise ValueError("truncated PNG: chunk overruns buffer")
        (crc,) = struct.unpack(">I", b[i + 8 + ln : i + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype}")
            if comp or filt:
                raise ValueError("invalid PNG compression/filter method")
            if inter:
                raise ValueError("unsupported PNG: Adam7 interlacing")
        elif tag == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + ln
    if w is None:
        raise ValueError("invalid PNG: no IHDR")
    ch = _CHANNELS[ctype]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("invalid PNG: IDAT size mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for r in range(h):
        ft = int(raw[r, 0])
        row = raw[r, 1:].astype(np.int64)
        if ft == 0:
            cur = row
        elif ft == 2:  # Up — vectorized
            cur = (row + prev) % 256
        elif ft in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.int64)
            for j in range(stride):
                a = cur[j - ch] if j >= ch else 0
                if ft == 1:  # Sub
                    cur[j] = (row[j] + a) % 256
                elif ft == 3:  # Average
                    cur[j] = (row[j] + (a + prev[j]) // 2) % 256
                else:  # Paeth
                    c = prev[j - ch] if j >= ch else 0
                    cur[j] = (row[j] + _paeth(int(a), int(prev[j]), int(c))) % 256
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[r] = cur
        prev = cur
    img = out.astype(np.uint8)
    if ctype == 3:
        if palette is None:
            raise ValueError("invalid PNG: palette image without PLTE")
        return palette[img.reshape(h, w)]
    if ch == 1:
        return img.reshape(h, w)
    return img.reshape(h, w, ch)
