"""Baseline JPEG codec in stdlib + numpy (no imaging library).

Closes the round-2 multimodal seam: baseline sequential DCT JPEG is
implementable with a Huffman coder + an 8x8 DCT matrix, matching the
repo's PNG-inflate precedent (operators/media_codecs.py).  Scope:

* **encode**: 8-bit gray or RGB, 4:4:4 (no chroma subsampling),
  Annex-K quantization + Huffman tables, JFIF wrapper.
* **decode**: baseline (SOF0) and extended-sequential (SOF1) scans,
  any H/V sampling factors (4:4:4 / 4:2:2 / 4:2:0 via nearest
  upsampling), restart markers, gray or YCbCr.
* progressive (SOF2+), arithmetic coding, and 12-bit precision raise
  ``MediaDecodeError`` — quarantined, never faked.

Self-consistency is guaranteed (encoder and decoder share the tables);
the tables themselves are the JPEG Annex K standard ones, so external
decoders read our output too.
"""

from __future__ import annotations

import struct

import numpy as np

from .media_codecs import MediaDecodeError

# row-major flat index of the k-th zigzag coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1/K.2 quantization tables (row-major)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64)

# Annex K Huffman specs: (counts per code length 1..16, symbol values)
DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_LUMA_VALS = tuple(range(12))
DC_CHROMA_BITS = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
DC_CHROMA_VALS = tuple(range(12))
AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_LUMA_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)
AC_CHROMA_BITS = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
AC_CHROMA_VALS = (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: forward F = C @ X @ C.T."""
    k = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = 0.5 * np.cos((2 * x + 1) * k * np.pi / 16)
    c[0, :] = 1.0 / np.sqrt(8.0)
    return c


_DCT = _dct_matrix()


def _encode_codes(bits, values) -> dict:
    """Canonical Huffman: symbol -> (code, length)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_codes(bits, values) -> dict:
    """Canonical Huffman: (length, code) -> symbol."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise MediaDecodeError("truncated JPEG scan data")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, count: int) -> int:
        v = 0
        for _ in range(count):
            v = (v << 1) | self.bit()
        return v


def _mag_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _receive_extend(br: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = br.bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


def _read_huffman(br: _BitReader, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise MediaDecodeError("invalid JPEG huffman code")


# --- encoder -------------------------------------------------------------------


def _fdct_quant(plane: np.ndarray, qt_zz: np.ndarray) -> np.ndarray:
    """(H8, W8) plane -> (n_blocks, 64) quantized zigzag coefficients."""
    h8, w8 = plane.shape
    blocks = (plane.reshape(h8 // 8, 8, w8 // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0)
    coef = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
    zz = coef.reshape(-1, 64)[:, ZIGZAG]
    return np.round(zz / qt_zz).astype(np.int64)


def _encode_block(zz: np.ndarray, dc_pred: int, dc_tbl: dict, ac_tbl: dict,
                  bw: _BitWriter) -> int:
    diff = int(zz[0]) - dc_pred
    s = abs(diff).bit_length()
    code, ln = dc_tbl[s]
    bw.write(code, ln)
    if s:
        bw.write(_mag_bits(diff, s), s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tbl[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(_mag_bits(v, s), s)
        run = 0
    if run:
        code, ln = ac_tbl[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def encode_jpeg(pixels: np.ndarray) -> bytes:
    """uint8 (h, w[, 1|3|4]) -> baseline JFIF bytes (4:4:4, Annex-K
    tables; alpha dropped, 2-channel keeps the gray plane)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nch = px.shape
    if nch == 2:
        px = px[:, :, :1]
        nch = 1
    elif nch == 4:
        px = px[:, :, :3]
        nch = 3

    if nch == 1:
        planes = [px[:, :, 0].astype(np.float64)]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0,
        ]
    h8, w8 = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [np.pad(p, ((0, h8 - h), (0, w8 - w)), mode="edge")
              for p in planes]

    ql_zz = QUANT_LUMA[ZIGZAG]
    qc_zz = QUANT_CHROMA[ZIGZAG]
    dc_l = _encode_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _encode_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _encode_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _encode_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    comp_zz = [_fdct_quant(p, ql_zz if i == 0 else qc_zz)
               for i, p in enumerate(planes)]
    tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    bw = _BitWriter()
    preds = [0] * len(planes)
    # 4:4:4 -> one block per component per MCU, row-major MCU order
    for m in range(comp_zz[0].shape[0]):
        for ci in range(len(planes)):
            preds[ci] = _encode_block(comp_zz[ci][m], preds[ci],
                                      tables[ci][0], tables[ci][1], bw)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00" + bytes([1, 1, 0])
                + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    out += _seg(0xDB, bytes([0x00]) + bytes(ql_zz.astype(np.uint8)))
    if nch == 3:
        out += _seg(0xDB, bytes([0x01]) + bytes(qc_zz.astype(np.uint8)))
    comps = bytes([1, 0x11, 0]) + (bytes([2, 0x11, 1, 3, 0x11, 1])
                                   if nch == 3 else b"")
    out += _seg(0xC0, bytes([8]) + struct.pack(">HH", h, w)
                + bytes([nch]) + comps)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS)
                + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS)
                + bytes(AC_LUMA_VALS))
    if nch == 3:
        out += _seg(0xC4, bytes([0x01]) + bytes(DC_CHROMA_BITS)
                    + bytes(DC_CHROMA_VALS))
        out += _seg(0xC4, bytes([0x11]) + bytes(AC_CHROMA_BITS)
                    + bytes(AC_CHROMA_VALS))
    scan = bytes([1, 0x00]) + (bytes([2, 0x11, 3, 0x11])
                               if nch == 3 else b"")
    out += _seg(0xDA, bytes([nch]) + scan + bytes([0, 63, 0]))
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder -------------------------------------------------------------------


def _split_scan(payload: bytes, start: int) -> list[bytes]:
    """Entropy bytes from ``start``: unstuff 0xFF00, split on RSTn."""
    segments, cur = [], bytearray()
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        nxt = payload[i + 1]
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or any other marker ends the scan
            break
    segments.append(bytes(cur))
    return segments


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 (h, w, 1|3)."""
    if payload[:3] != b"\xff\xd8\xff":
        raise MediaDecodeError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple, dict] = {}
    frame = None           # (h, w, [(cid, hs, vs, tq)])
    restart = 0
    scan = None            # ([(comp_idx, td, ta)], segments)

    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        if seglen < 2 or pos + 2 + seglen > n:
            raise MediaDecodeError("truncated JPEG segment")
        body = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                j += 1
                if pq:
                    vals = np.frombuffer(body[j:j + 128],
                                         dtype=">u2").astype(np.float64)
                    j += 128
                else:
                    vals = np.frombuffer(body[j:j + 64],
                                         dtype=np.uint8).astype(np.float64)
                    j += 64
                qt[tq] = vals  # zigzag order, as stored
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec = body[0]
            if prec != 8:
                raise MediaDecodeError(f"unsupported JPEG precision {prec}")
            h, w = struct.unpack(">HH", body[1:5])
            nf = body[5]
            comps = []
            for c in range(nf):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise MediaDecodeError(
                "unsupported JPEG coding process (progressive/arithmetic)")
        elif marker == 0xC4:  # DHT (possibly several tables)
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = tuple(body[j + 1:j + 17])
                nv = sum(bits)
                vals = tuple(body[j + 17:j + 17 + nv])
                huff[(tc, th)] = _decode_codes(bits, vals)
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise MediaDecodeError("JPEG SOS before SOF")
            ns = body[0]
            comps_in_scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c:3 + 2 * c]
                idx = next((k for k, fc in enumerate(frame[2])
                            if fc[0] == cs), None)
                if idx is None:
                    raise MediaDecodeError("JPEG scan references unknown "
                                           "component")
                comps_in_scan.append((idx, tt >> 4, tt & 0x0F))
            if ns != len(frame[2]):
                raise MediaDecodeError(
                    "multi-scan (non-interleaved) JPEG not supported")
            scan = (comps_in_scan, _split_scan(payload, pos + 2 + seglen))
            break
        pos += 2 + seglen

    if frame is None or scan is None:
        raise MediaDecodeError("truncated JPEG (no SOF/SOS)")
    h, w, comps = frame
    if h == 0 or w == 0 or h * w > (1 << 26):
        raise MediaDecodeError(f"JPEG dimensions out of bounds ({w}x{h})")
    comps_in_scan, segments = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    for _cid, hs, vs, _tq in comps:
        # upsampling is integer replication; non-divisor factors (3:2)
        # would silently repeat(0) into an empty plane downstream —
        # reject with a typed error instead
        if hs == 0 or vs == 0 or hmax % hs or vmax % vs:
            raise MediaDecodeError(
                f"unsupported JPEG sampling factors ({hs}x{vs} vs max "
                f"{hmax}x{vmax})")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component dequantized coefficient blocks, MCU-ordered
    blocks: list[list] = [[] for _ in comps]
    preds = [0] * len(comps)
    seg_idx = 0
    br = _BitReader(segments[0])
    total_mcus = mcus_x * mcus_y
    # entropy-decode bomb guards: the MCU loop is interpreted Python, so
    # bound its work *before* entering it.  (a) per-COMPONENT block cap
    # — 2^17 blocks per scan component ≈ 8 MP at that component's full
    # resolution, so an ordinary 4:4:4 or 4:2:0 photo up to ~8 MP still
    # decodes while a claimed-dimensions bomb quarantines; (b) every
    # block consumes >= 2 bits (one DC code + one EOB), so a tiny
    # payload claiming huge dimensions is provably truncated and
    # quarantines in O(1) instead of O(claimed pixels).
    blocks_per_mcu = sum(comps[idx][1] * comps[idx][2]
                         for idx, _td, _ta in comps_in_scan)
    total_blocks = total_mcus * blocks_per_mcu
    if total_blocks > (1 << 17) * max(1, len(comps_in_scan)):
        raise MediaDecodeError(
            f"JPEG entropy-decode work out of bounds ({total_blocks} blocks)")
    if total_blocks * 2 > sum(len(s) for s in segments) * 8:
        raise MediaDecodeError("truncated JPEG scan data")
    for m in range(total_mcus):
        if restart and m and m % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise MediaDecodeError("missing JPEG restart segment")
            br = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
        for idx, td, ta in comps_in_scan:
            _cid, hs, vs, tq = comps[idx]
            dc_tbl = huff.get((0, td))
            ac_tbl = huff.get((1, ta))
            q = qt.get(tq)
            if dc_tbl is None or ac_tbl is None or q is None:
                raise MediaDecodeError("JPEG scan uses undefined table")
            for _ in range(hs * vs):
                zz = np.zeros(64, dtype=np.float64)
                s = _read_huffman(br, dc_tbl)
                preds[idx] += _receive_extend(br, s)
                zz[0] = preds[idx]
                k = 1
                while k < 64:
                    rs = _read_huffman(br, ac_tbl)
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += rs >> 4
                    if k > 63:
                        raise MediaDecodeError("JPEG AC run overflow")
                    zz[k] = _receive_extend(br, rs & 0x0F)
                    k += 1
                blocks[idx].append(zz * q)

    # batch IDCT per component, assemble planes, upsample, color-convert
    planes = []
    for idx, (_cid, hs, vs, _tq) in enumerate(comps):
        bw_, bh_ = mcus_x * hs, mcus_y * vs
        coef = np.zeros((len(blocks[idx]), 64), dtype=np.float64)
        zzs = np.stack(blocks[idx])
        coef[:, ZIGZAG] = zzs
        mats = coef.reshape(-1, 8, 8)
        spatial = np.einsum("ji,njk,kl->nil", _DCT, mats, _DCT) + 128.0
        plane = np.zeros((bh_ * 8, bw_ * 8), dtype=np.float64)
        # blocks were emitted MCU-major, then vs*hs within the MCU
        b = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for v in range(vs):
                    for hh in range(hs):
                        plane[(my * vs + v) * 8:(my * vs + v + 1) * 8,
                              (mx * hs + hh) * 8:(mx * hs + hh + 1) * 8] = \
                            spatial[b]
                        b += 1
        plane = plane.repeat(vmax // vs, axis=0).repeat(hmax // hs, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(planes[0], 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=2)
    return np.clip(rgb, 0, 255).astype(np.uint8)
