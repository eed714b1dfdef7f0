"""Pure-stdlib PNG codec (zlib + struct + numpy) — a REAL decode path.

The container has no image libraries, but PNG needs none: the format is
zlib-compressed filtered scanlines (RFC 2083).  This module implements

* :func:`decode_png` — signature/IHDR parse, IDAT concat + inflate, and
  per-row unfiltering for all five PNG filter types, returning an
  ``(h, w, channels)`` uint8 numpy array.  Supports the formats the
  pipeline's synthetic fixtures and typical ML corpora use: bit depth 8,
  color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), interlace 0.
* :func:`encode_png` — minimal writer (filter 0 rows) used by fixtures and
  the resize path's re-encode step.

Filters 0 (None) and 2 (Up) unfilter fully vectorized; 1 (Sub) uses the
per-lane cumsum-mod-256 trick; 3 (Average) and 4 (Paeth) carry a left-pixel
recurrence so they fall back to a per-pixel inner loop — the synthetic
fixtures and the re-encoder emit filter-0 rows, keeping the hot path
vectorized, while arbitrary external PNGs still decode correctly.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    pass


def is_png(data: bytes) -> bool:
    return len(data) > 8 and bytes(data[:8]) == _SIGNATURE


def _chunks(data: bytes):
    off = 8
    while off + 8 <= len(data):
        (length,) = struct.unpack(">I", data[off : off + 4])
        ctype = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + length]
        yield ctype, payload
        off += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            return


def decode_png(data: bytes):
    """PNG bytes -> uint8 numpy array of shape (h, w, channels)."""
    import numpy as np

    if not is_png(data):
        raise PngError("not a PNG (bad signature)")
    width = height = None
    channels = 0
    idat = []
    for ctype, payload in _chunks(bytes(data)):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise PngError(f"unsupported color type {color}")
            if interlace != 0:
                raise PngError("interlaced PNG not supported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(payload)
    if width is None or not idat:
        raise PngError("missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = width * channels
    if raw.size != height * (stride + 1):
        raise PngError("scanline payload size mismatch")
    rows = raw.reshape(height, stride + 1)
    filters = rows[:, 0]
    scan = rows[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    bpp = channels
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        f = int(filters[y])
        cur = scan[y]
        if f == 0:  # None
            rec = cur
        elif f == 1:  # Sub: per-lane cumulative sum mod 256
            rec = cur.reshape(-1, bpp).cumsum(axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f == 3:  # Average (left recurrence)
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (cur[x] + (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth (left recurrence)
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                rec[x] = (cur[x] + pred) % 256
        else:
            raise PngError(f"bad filter type {f}")
        out[y] = rec
        prev = out[y]
    return out.astype(np.uint8).reshape(height, width, channels)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels) -> bytes:
    """uint8 array (h, w) or (h, w, channels) -> PNG bytes (filter-0 rows)."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, channels = arr.shape
    color = {1: 0, 3: 2, 2: 4, 4: 6}.get(channels)
    if color is None:
        raise PngError(f"unsupported channel count {channels}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = arr.reshape(h, w * channels)
    scan = np.zeros((h, w * channels + 1), dtype=np.uint8)
    scan[:, 1:] = flat  # filter byte 0 per row
    idat = zlib.compress(scan.tobytes(), 6)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def resize_nearest(pixels, width: int, height: int):
    """Nearest-neighbor resize of an (h, w, c) uint8 array — one 2-D gather."""
    import numpy as np

    arr = np.asarray(pixels)
    h, w = arr.shape[:2]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys[:, None], xs[None, :]]
