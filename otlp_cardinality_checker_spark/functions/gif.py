"""Pure-stdlib GIF87a/89a codec (struct + numpy) — real LZW decompression.

Unlike the rawvideo-AVI path (``functions/avi.py``), GIF frames are
genuinely *compressed*: pixel indices run through the GIF variant of LZW
(variable code width 3..12 bits, LSB-first bit packing, CLEAR/END codes,
4096-entry dictionary with reset) before landing in 255-byte sub-blocks.
Because LZW is lossless, decoded pixels still admit a closed-form
bit-exact oracle — this is the repo's first *compressed* codec decoded
for real.

Scope (enough for the multimodal contract, refused loudly otherwise):
global color table only, no interlacing, no transparency compositing;
animated GIFs decode as full-size replace-mode frames.  The matching
:func:`encode_gif` writer emits real LZW (dictionary build, width
growth, table-full CLEAR resets), not the uncompressed-GIF trick.

* :func:`decode_gif` -> (frames uint8[n, h, w] of palette indices,
  palette uint8[n_colors, 3] RGB, delay_cs)
* :func:`encode_gif` — the matching writer, used by fixtures.
"""

from __future__ import annotations

import struct


class GifError(ValueError):
    pass


def is_gif(data: bytes) -> bool:
    return len(data) > 13 and bytes(data[:4]) == b"GIF8" and data[5:6] == b"a"


_MAX_CODE_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int):
    """GIF-variant LZW: variable width, LSB-first, CLEAR/END codes."""
    import numpy as np

    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None

    acc = 0
    n_bits = 0
    pos = 0
    while True:
        while n_bits < width:
            if pos >= len(data):
                raise GifError("LZW stream truncated before END code")
            acc |= data[pos] << n_bits
            n_bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GifError(f"first code {code} out of table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
        else:
            raise GifError(f"code {code} beyond table size {len(table)}")
        out += entry
        if prev is not None and len(table) < _TABLE_LIMIT:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
        if len(out) > n_pixels:
            raise GifError("LZW produced more pixels than the frame holds")
    if len(out) != n_pixels:
        raise GifError(f"LZW produced {len(out)} pixels, frame needs {n_pixels}")
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _lzw_encode(indices, min_code_size: int) -> bytes:
    """Real GIF LZW compressor: dictionary build, width growth, CLEAR at
    table-full."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = 0
    n_bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    n_since_reset = 0  # data codes emitted since the last CLEAR
    emit(clear, width)
    buf = b""
    for sym in bytes(indices):
        nxt = buf + bytes([sym])
        if nxt in table:
            buf = nxt
            continue
        emit(table[buf], width)
        n_since_reset += 1
        if next_code == _TABLE_LIMIT:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
            n_since_reset = 0
        else:
            table[nxt] = next_code
            next_code += 1
            # decoder trails one entry behind mid-stream, so it needs
            # width w when OUR next_code passes 2^w by one
            if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                width += 1
        buf = bytes([sym])
    if buf:
        emit(table[buf], width)
        n_since_reset += 1
    # END-code width edge: the decoder adds one more table entry after the
    # final data code (we don't), erasing its one-entry lag — if that add
    # lands exactly on 2^width it bumps and reads END at width+1
    if (
        n_since_reset >= 2
        and next_code == (1 << width)
        and width < _MAX_CODE_WIDTH
    ):
        width += 1
    emit(end, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(data: bytes):
    """GIF bytes -> (uint8 index frames (n, h, w), uint8 palette (k, 3),
    delay in centiseconds from the first Graphic Control Extension)."""
    import numpy as np

    if not is_gif(data):
        raise GifError("not a GIF87a/GIF89a stream")
    data = bytes(data)
    width, height, flags = struct.unpack("<HHB", data[6:11])
    if not flags & 0x80:
        raise GifError("missing global color table")
    n_colors = 2 << (flags & 0x07)
    pos = 13
    palette = np.frombuffer(
        data[pos : pos + n_colors * 3], dtype=np.uint8
    ).reshape(n_colors, 3)
    pos += n_colors * 3

    frames = []
    delay_cs = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            label = data[pos]
            pos += 1
            sub_start = pos
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1  # terminator
            if label == 0xF9 and not delay_cs:
                delay_cs = struct.unpack(
                    "<H", data[sub_start + 2 : sub_start + 4]
                )[0]
            continue
        if block != 0x2C:
            raise GifError(f"unexpected block 0x{block:02x}")
        left, top, fw, fh, fflags = struct.unpack(
            "<HHHHB", data[pos : pos + 9]
        )
        pos += 9
        if fflags & 0x80:
            raise GifError("local color tables unsupported")
        if fflags & 0x40:
            raise GifError("interlaced frames unsupported")
        if (left, top, fw, fh) != (0, 0, width, height):
            raise GifError("partial-canvas frames unsupported")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            n = data[pos]
            lzw += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
        pos += 1  # terminator
        frames.append(
            _lzw_decode(bytes(lzw), min_code_size, fw * fh).reshape(fh, fw)
        )
    if not frames:
        raise GifError("no image frames")
    return np.stack(frames), palette, delay_cs


def encode_gif(frames, palette, delay_cs: int = 4) -> bytes:
    """uint8 index frames (n, h, w) + uint8 palette (k, 3) -> GIF89a."""
    import numpy as np

    arr = np.asarray(frames, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if arr.ndim != 3:
        raise GifError("frames must be (n, h, w) palette indices")
    n, h, w = arr.shape
    k = pal.shape[0]
    if k < 2 or k > 256 or (k & (k - 1)):
        raise GifError("palette size must be a power of two in [2, 256]")
    if arr.max(initial=0) >= k:
        raise GifError("pixel index out of palette range")
    depth = max(k.bit_length() - 1, 1)  # log2(k)
    min_code_size = max(depth, 2)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    for i in range(n):
        # GCE: label, size=4, [flags, delay(2), transparent], terminator
        out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delay_cs, 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code_size)
        lzw = _lzw_encode(arr[i].tobytes(), min_code_size)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
