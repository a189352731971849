"""GIF codec in pure Python + numpy (no imaging library).

Closes the last image-format seam: GIF's LZW is a ~100-line variable-
code-size dictionary coder, same stdlib-only spirit as the PNG inflate
and baseline-JPEG codecs.

* **decode**: GIF87a/89a, global/local color tables, interlace, restart
  (clear) codes, first frame composited onto the logical screen.
* **encode**: single frame, 3-3-2 RGB cube palette (256 entries, direct
  index mapping — lossy like any palettized format, but deterministic),
  real LZW with growing code sizes.

Animation frames beyond the first are ignored by ``decode_gif`` (the
feature tier wants one raster); hostile dimension claims are capped
before allocation, mirroring decode_png.
"""

from __future__ import annotations

import struct

import numpy as np

from .media_codecs import MediaDecodeError

_GIF_MAX_PIXELS = 1 << 26


# --- LZW (GIF variant: LSB-first bit packing, variable code size) -----------


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    if not 2 <= min_code_size <= 11:
        raise MediaDecodeError(f"bad GIF LZW code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: dict[int, bytes] = {i: bytes([i]) for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits:
        byte_idx = bitpos >> 3
        chunk = int.from_bytes(data[byte_idx:byte_idx + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = {i: bytes([i]) for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise MediaDecodeError("bad GIF LZW start code")
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise MediaDecodeError("bad GIF LZW code")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
        # GIF89a convention (giflib/PIL/browsers): the decoder grows its
        # code size when next_code reaches 2^cs — the encoder grows one
        # code LATER (2^cs + 1) because it runs one dict entry ahead of
        # the lazy decoder.  (First cut had both one code early: self-
        # consistent, but incompatible with every real-world GIF.)
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        out += entry
        prev = entry
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise MediaDecodeError("truncated GIF LZW stream")
    return bytes(out[:expected])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, code_size)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            # one code later than the decoder's 2^cs rule (see _lzw_decode)
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:  # dictionary full: reset (our frames never get here)
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([k])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- container ----------------------------------------------------------------


def decode_gif(payload: bytes) -> np.ndarray:
    """First GIF frame -> uint8 (h, w, 3) on the logical screen."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise MediaDecodeError("not a GIF")
    if len(payload) < 13:
        raise MediaDecodeError("truncated GIF header")
    w, h = struct.unpack("<HH", payload[6:10])
    if w == 0 or h == 0 or w * h > _GIF_MAX_PIXELS:
        raise MediaDecodeError(f"GIF dimensions out of bounds ({w}x{h})")
    packed, bg, _aspect = payload[10], payload[11], payload[12]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if len(payload) - pos < 3 * n:
            raise MediaDecodeError("truncated GIF color table")
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: skip sub-blocks
            pos += 1  # label
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if len(payload) - pos < 9:
                raise MediaDecodeError("truncated GIF image descriptor")
            left, top, iw, ih = struct.unpack("<HHHH", payload[pos:pos + 8])
            ipacked = payload[pos + 8]
            pos += 9
            if iw == 0 or ih == 0 or iw * ih > _GIF_MAX_PIXELS:
                raise MediaDecodeError("GIF frame dimensions out of bounds")
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                if len(payload) - pos < 3 * n:
                    raise MediaDecodeError("truncated GIF color table")
                pal = np.frombuffer(payload[pos:pos + 3 * n],
                                    dtype=np.uint8).reshape(-1, 3)
                pos += 3 * n
            if pal is None:
                raise MediaDecodeError("GIF frame has no color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(data), min_code, iw * ih), dtype=np.uint8)
            if idx.max(initial=0) >= len(pal):
                raise MediaDecodeError("GIF index outside color table")
            frame = idx.reshape(ih, iw)
            if ipacked & 0x40:  # interlaced: 4-pass row order
                deinter = np.empty_like(frame)
                rows = np.concatenate([np.arange(0, ih, 8),
                                       np.arange(4, ih, 8),
                                       np.arange(2, ih, 4),
                                       np.arange(1, ih, 2)])
                deinter[rows] = frame
                frame = deinter
            # background fill uses the GLOBAL table (the bg index is
            # defined against it); only the frame region uses the
            # frame's palette (which may be a local table)
            if gct is not None and bg < len(gct):
                canvas = np.tile(gct[bg], (h, w, 1)).astype(np.uint8)
            else:
                canvas = np.zeros((h, w, 3), dtype=np.uint8)
            y1, x1 = min(top + ih, h), min(left + iw, w)
            canvas[top:y1, left:x1] = pal[frame[:y1 - top, :x1 - left]]
            return canvas
        elif block == 0x3B:  # trailer
            break
        else:
            raise MediaDecodeError(f"unknown GIF block 0x{block:02x}")
    raise MediaDecodeError("GIF contains no image frame")


def _cube_palette() -> np.ndarray:
    """3-3-2 RGB cube: index = r3 << 5 | g3 << 2 | b2."""
    idx = np.arange(256)
    r = ((idx >> 5) & 7) * 255 // 7
    g = ((idx >> 2) & 7) * 255 // 7
    b = (idx & 3) * 255 // 3
    return np.stack([r, g, b], axis=1).astype(np.uint8)


def encode_gif(pixels: np.ndarray) -> bytes:
    """uint8 (h, w[, channels]) -> single-frame GIF89a (3-3-2 palette)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    elif px.shape[2] == 2:
        px = np.repeat(px[:, :, :1], 3, axis=2)
    h, w = px.shape[:2]
    r, g, b = (px[:, :, i].astype(np.uint16) for i in range(3))
    idx = ((r >> 5) << 5 | (g >> 5) << 2 | (b >> 6)).astype(np.uint8)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0xF7, 0, 0])  # GCT, 256 entries; bg 0; aspect 0
    out += _cube_palette().tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([8])  # LZW min code size
    lzw = _lzw_encode(idx.tobytes(), 8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
