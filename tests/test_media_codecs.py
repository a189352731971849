"""Pure media codecs: PNG/PPM/BMP/WAV round-trips, header metadata."""

import struct

import numpy as np
import pytest

from cbor_ld_spark.operators.media_codecs import (
    MediaDecodeError,
    average_hash,
    decode_bmp,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_png,
    encode_ppm,
    encode_wav,
    gif_dimensions,
    jpeg_dimensions,
    resize_nearest,
)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("shape", [(5, 7, 3), (16, 16, 1), (9, 4, 4),
                                   (3, 3, 2), (1, 1, 3)])
def test_png_roundtrip(shape):
    px = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(px)), px)


@pytest.mark.parametrize("shape", [(5, 7, 3), (8, 3, 1)])
def test_ppm_roundtrip(shape):
    px = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


def test_ppm_comments_and_whitespace():
    px = decode_ppm(b"P5\n# a comment\n 2 2\n255\nABCD")
    assert px.shape == (2, 2, 1) and bytes(px.flatten()) == b"ABCD"


def test_bmp_decode_bottom_up_with_padding():
    w, h = 3, 2
    pxr = RNG.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    row_bytes = (w * 3 + 3) & ~3
    body = b""
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            r, g, b = pxr[y, x]
            row += bytes([b, g, r])
        row += b"\x00" * (row_bytes - len(row))
        body += bytes(row)
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    assert np.array_equal(decode_bmp(hdr + info + body), pxr)


def test_wav_roundtrip_and_features():
    s = (np.sin(np.linspace(0, 40, 4410)) * 20000).astype("<i2")
    rate, nch, back = decode_wav(encode_wav(s, 44100))
    assert (rate, nch) == (44100, 1)
    assert np.array_equal(back[:, 0], s)


def test_jpeg_gif_header_dimensions():
    jp = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 15) + b"JFIF\x00"
          + b"\x00" * 8
          + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
          + struct.pack(">HH", 33, 47) + b"\x01" + b"\x00" * 3)
    assert jpeg_dimensions(jp) == (47, 33)
    assert gif_dimensions(b"GIF89a" + struct.pack("<HH", 12, 34)
                          + b"\x00" * 10) == (12, 34)


def test_resize_and_ahash_deterministic():
    px = RNG.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    r = resize_nearest(px, 8, 8)
    assert r.shape == (8, 8, 3)
    assert average_hash(px) == average_hash(px)
    assert len(average_hash(px)) == 16


@pytest.mark.parametrize("bad,exc", [
    (b"", MediaDecodeError),
    (b"\x89PNG\r\n\x1a\x00", MediaDecodeError),          # bad signature
    (b"\x89PNG\r\n\x1a\n\x00\x00\x00\x00", MediaDecodeError),  # no IHDR
    (b"P6\n2 2\n255\nAB", MediaDecodeError),             # truncated pixels
])
def test_hostile_inputs_raise_typed(bad, exc):
    for fn in (decode_png, decode_ppm):
        with pytest.raises((MediaDecodeError, ValueError)):
            fn(bad)


def test_png_interlace_rejected():
    px = RNG.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_png(px))
    # IHDR interlace byte is the 13th byte of the IHDR data block
    ihdr_data_off = 8 + 8  # sig + len/type
    data[ihdr_data_off + 12] = 1
    with pytest.raises(MediaDecodeError, match="interlace"):
        decode_png(bytes(data))


def test_ppm_gray_alpha_and_rgba_channels():
    """Review r2: 2-channel (gray+alpha) input must emit a valid P5, not
    a corrupt P6; RGBA drops alpha into a valid P6."""
    ga = RNG.integers(0, 256, size=(4, 5, 2), dtype=np.uint8)
    out = decode_ppm(encode_ppm(ga))
    assert out.shape == (4, 5, 1)
    assert np.array_equal(out[:, :, 0], ga[:, :, 0])
    rgba = RNG.integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
    out = decode_ppm(encode_ppm(rgba))
    assert np.array_equal(out, rgba[:, :, :3])


try:
    from hypothesis import given, settings, strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    @settings(max_examples=40, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24),
           st.sampled_from([1, 2, 3, 4]), st.integers(0, 2**32 - 1))
    def test_png_roundtrip_property(w, h, nch, seed):
        px = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, nch), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 2000), st.sampled_from([1, 2]),
           st.sampled_from([8000, 44100]), st.integers(0, 2**32 - 1))
    def test_wav_roundtrip_property(n, nch, rate, seed):
        s = np.random.default_rng(seed).integers(
            -32768, 32768, size=(n, nch)).astype("<i2")
        got_rate, got_nch, back = decode_wav(encode_wav(s, rate))
        assert (got_rate, got_nch) == (rate, nch)
        assert np.array_equal(back, s)

    @settings(max_examples=50, deadline=None)
    @given(st.binary(min_size=0, max_size=64))
    def test_decoders_raise_typed_on_garbage(data):
        import struct as _struct
        import zlib as _zlib

        from cbor_ld_spark.operators.gif_codec import decode_gif
        from cbor_ld_spark.operators.jpeg_codec import decode_jpeg

        # quarantine-friendly contract: decoders raise, never hang or
        # return garbage silently; raise types are bounded
        allowed = (MediaDecodeError, ValueError, _struct.error,
                   _zlib.error, IndexError)
        for fn in (decode_png, decode_ppm, decode_bmp, decode_wav,
                   decode_jpeg, decode_gif,
                   jpeg_dimensions, gif_dimensions):
            try:
                fn(data)
            except allowed:
                pass


def test_png_zlib_bomb_rejected_bounded():
    """Advice r2: a hostile IDAT must not inflate past the IHDR-implied
    size — the inflate is bounded, so a multi-GB bomb costs ~nothing."""
    import zlib

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    # claims 2x2 gray (expect = 2*(1+2) = 6 bytes) but carries 64 MB
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (64 << 20), 9)  # ~64 KB compressed
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
    with pytest.raises(MediaDecodeError, match="overrun"):
        decode_png(payload)


def test_png_hostile_dimensions_rejected():
    import zlib

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    # 2^31-ish pixel claim must be rejected before any allocation
    ihdr = struct.pack(">IIBBBBB", 1 << 16, 1 << 15, 8, 2, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(b"\x00")) + chunk(b"IEND", b""))
    with pytest.raises(MediaDecodeError, match="out of bounds"):
        decode_png(payload)
