"""Minimal RIFF/AVI container codec for MJPEG streams (stdlib struct).

Closes the last media-tier seam: with a real baseline JPEG codec in the
repo (``operators/jpeg_codec.py``), video only needs the *container*
layer — and AVI 1.0 with an MJPEG ``vids`` stream is ~plain RIFF chunk
walking.  Both directions are implemented so the synthesized corpus
(``multimodal.synthesize_media_row``) carries genuinely demuxable
payloads and ``sample_frames`` is a real pixel tier end-to-end, the
same bar the image formats meet.

Format facts used here are public structure definitions (Microsoft
AVI RIFF reference: MainAVIHeader / AVIStreamHeader /
BITMAPINFOHEADER, 'movi' record naming ``##dc``/``##db``, even-byte
chunk padding, 'idx1' entries).  Strictness follows the pipeline's
quarantine contract: malformed containers raise a typed
``MediaDecodeError`` (``media_codecs.py``), never a bare crash, and
decode work is bounded by the payload length plus an explicit frame
cap — there is no dimension-claimed amplification the way entropy
coding allows (reference precedent for the guard shape:
``jpeg_codec.py`` bomb guards).
"""

from __future__ import annotations

import struct

from .media_codecs import MediaDecodeError

MAX_FRAMES = 4096  # hard demux cap: bounds downstream JPEG-decode work


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     us_per_frame: int = 100_000) -> bytes:
    """JPEG-per-frame list -> AVI 1.0 bytes ('vids'/'MJPG' stream).

    ``frames`` are complete JFIF payloads (``jpeg_codec.encode_jpeg``
    output); ``us_per_frame`` is the frame interval in microseconds
    (100_000 = 10 fps).
    """
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    if us_per_frame <= 0:
        raise ValueError("us_per_frame must be positive")
    if any(len(f) > 0xFFFFFFFF for f in frames):
        raise ValueError(
            "AVI frame exceeds the RIFF u32 size limit")

    def chunk(ckid: bytes, body: bytes) -> bytes:
        # RIFF chunk sizes are u32; oversized bodies must fail loudly, not
        # as an untyped struct.error (mirrors the bytes_per_sec guard)
        if len(body) > 0xFFFFFFFF:
            raise ValueError(
                f"AVI chunk {ckid!r} body {len(body)} bytes exceeds the "
                "RIFF u32 size limit")
        pad = b"\x00" if len(body) % 2 else b""
        return ckid + struct.pack("<I", len(body)) + body + pad

    def lst(four: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", four + body)

    max_size = max(len(f) for f in frames)
    # dwMaxBytesPerSec is a u32; huge frames at high fps would overflow
    # struct.pack with an untyped struct.error — clamp (informational
    # field only)
    bytes_per_sec = min(max_size * 1_000_000 // us_per_frame, 0xFFFFFFFF)
    avih = struct.pack(
        "<14I", us_per_frame, bytes_per_sec,
        0, 0x10,  # padding, AVIF_HASINDEX
        len(frames), 0, 1, max_size, width, height, 0, 0, 0, 0)
    # strh, 56 bytes: fccType fccHandler flags prio+lang initial_frames
    # scale rate start length suggested_buffer quality sample_size
    # rcFrame[4 shorts]
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1,
                          1_000_000 // us_per_frame, 0, len(frames),
                          max_size, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1 offsets are relative to the 'movi' fourcc position
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))

    body = b"AVI " + hdrl + movi + idx1
    if len(body) > 0xFFFFFFFF:
        raise ValueError(
            f"AVI total body {len(body)} bytes exceeds the RIFF u32 size "
            "limit")
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """AVI bytes -> (us_per_frame, width, height, [jpeg_frame, ...]).

    Walks the RIFF chunk tree: 'avih' supplies timing + dimensions,
    stream-0 records (``00dc``/``00db``) inside 'movi' supply the JPEG
    payloads in presentation order.  Raises ``MediaDecodeError`` for
    anything malformed (truncated chunk, missing headers, >MAX_FRAMES).
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise MediaDecodeError("not a RIFF/AVI payload")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    if riff_size + 8 > len(payload) + 1:  # +1: tolerate odd-pad slack
        raise MediaDecodeError("truncated AVI (RIFF size exceeds payload)")

    us_per_frame = None
    width = height = None
    frames: list[bytes] = []

    # Iterative chunk walk over (offset, end) INDICES into the one
    # payload buffer — no per-level byte slicing, so a crafted payload
    # of deeply nested 12-byte LIST headers costs O(depth) stack tuples,
    # not O(payload^2) copied bytes, and hits the typed-error contract
    # instead of RecursionError.  Each nested LIST consumes >= 12
    # payload bytes, so stack depth is bounded by len(payload)/12.
    pos = 12
    end = min(12 + riff_size - 4, len(payload))
    in_movi = False
    stack: list[tuple[int, int, bool]] = []
    while True:
        if pos + 8 > end:
            if not stack:
                break
            pos, end, in_movi = stack.pop()
            continue
        ckid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body_start = pos + 8
        body_end = body_start + size
        if body_end > end:
            raise MediaDecodeError("truncated AVI chunk")
        pos = body_end + (size % 2)
        if ckid == b"LIST":
            if size < 4:
                raise MediaDecodeError("malformed AVI LIST")
            stack.append((pos, end, in_movi))
            in_movi = in_movi or \
                payload[body_start:body_start + 4] == b"movi"
            pos, end = body_start + 4, body_end
        elif ckid == b"avih":
            if size < 40:
                raise MediaDecodeError("short avih header")
            vals = struct.unpack_from("<10I", payload, body_start)
            us_per_frame = vals[0]
            width, height = vals[8], vals[9]
        elif in_movi and ckid in (b"00dc", b"00db"):
            if len(frames) >= MAX_FRAMES:
                raise MediaDecodeError(
                    f"AVI exceeds {MAX_FRAMES}-frame demux cap")
            frames.append(payload[body_start:body_end])
    if us_per_frame is None or not us_per_frame:
        raise MediaDecodeError("AVI missing avih timing header")
    if not frames:
        raise MediaDecodeError("AVI contains no stream-0 video records")
    return us_per_frame, int(width), int(height), frames
