"""Pure-stdlib AVI/rawvideo parser (struct + numpy) — real VIDEO frames.

An uncompressed-rawvideo AVI is a RIFF container (like WAV): a `hdrl`
LIST holding the `avih` main header and one `strl` stream (whose `strf`
is a BITMAPINFOHEADER), then a `movi` LIST whose `00db` chunks are raw
bottom-up BGR24 DIB frames with 4-byte-aligned row stride — the layout
ffmpeg's `-c:v rawvideo -pix_fmt bgr24` emits.  No codec is involved, so
the whole container parses with stdlib struct and one numpy reshape per
frame; this makes video the THIRD really-decoded modality (after PNG and
WAV), leaving only compressed codecs stubbed.

* :func:`decode_avi` -> (frames uint8[n, h, w, 3] in BGR order,
  fps_num/fps_den as microseconds-per-frame)
* :func:`encode_avi` — the matching writer, used by fixtures.
"""

from __future__ import annotations

import struct


class AviError(ValueError):
    pass


def is_avi(data: bytes) -> bool:
    return (
        len(data) > 24
        and bytes(data[:4]) == b"RIFF"
        and bytes(data[8:12]) == b"AVI "
    )


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, list_type_or_None, body_lo, body_hi) over a chunk run."""
    off = start
    while off + 8 <= end:
        cid = data[off : off + 4]
        (size,) = struct.unpack("<I", data[off + 4 : off + 8])
        lo = off + 8
        if cid in (b"RIFF", b"LIST"):
            yield cid, data[lo : lo + 4], lo + 4, lo + size
        else:
            yield cid, None, lo, lo + size
        off = lo + size + (size & 1)  # word alignment


def decode_avi(data: bytes):
    """AVI bytes -> (uint8 frames (n, h, w, 3) BGR, micros_per_frame)."""
    import numpy as np

    if not is_avi(data):
        raise AviError("not a RIFF/AVI stream")
    data = bytes(data)
    width = height = None
    us_per_frame = None
    raw_frames: list[bytes] = []

    def scan(lo: int, hi: int) -> None:
        nonlocal width, height, us_per_frame
        for cid, ltype, blo, bhi in _walk(data, lo, hi):
            if cid == b"LIST":
                if ltype in (b"hdrl", b"movi", b"strl", b"rec "):
                    scan(blo, bhi)
            elif cid == b"avih":
                us_per_frame, = struct.unpack("<I", data[blo : blo + 4])
                width, height = struct.unpack(
                    "<II", data[blo + 32 : blo + 40]
                )
            elif cid == b"strf" and bhi - blo >= 40:
                bits, comp = struct.unpack(
                    "<HI", data[blo + 14 : blo + 20]
                )
                if comp != 0 or bits != 24:
                    raise AviError(
                        f"unsupported video (bits={bits}, compression={comp})"
                    )
            elif cid[2:4] in (b"db", b"dc") and cid[:2].isdigit():
                raw_frames.append(data[blo:bhi])

    scan(12, len(data))
    if width is None or not raw_frames:
        raise AviError("missing avih header or frames")
    stride = (width * 3 + 3) & ~3  # DIB rows pad to 4 bytes
    frames = np.empty((len(raw_frames), height, width, 3), dtype=np.uint8)
    for i, raw in enumerate(raw_frames):
        if len(raw) != stride * height:
            raise AviError(
                f"frame {i}: {len(raw)} bytes != stride*height "
                f"{stride * height}"
            )
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride)
        # bottom-up DIB: last stored row is the top scanline
        frames[i] = rows[::-1, : width * 3].reshape(height, width, 3)
    return frames, us_per_frame


def encode_avi(frames, us_per_frame: int = 40000) -> bytes:
    """uint8 frames (n, h, w, 3) BGR -> rawvideo AVI bytes."""
    import numpy as np

    arr = np.asarray(frames, dtype=np.uint8)
    n, h, w, c = arr.shape
    if c != 3:
        raise AviError("frames must be (n, h, w, 3) BGR")
    stride = (w * 3 + 3) & ~3

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, stride * h * 1_000_000 // max(us_per_frame, 1), 0,
        0x10, n, 0, 1, stride * h, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIIII", 0, 0, 0, 0, us_per_frame, 1_000_000, 0, n,
            stride * h, 0, 0, 0,
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    for i in range(n):
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, : w * 3] = arr[i, ::-1].reshape(h, w * 3)  # bottom-up
        movi_body_frame = padded.tobytes()
        movi_body += chunk(b"00db", movi_body_frame)
    riff_body = b"AVI " + hdrl + chunk(b"LIST", movi_body)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
