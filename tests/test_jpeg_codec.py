"""Baseline JPEG codec: roundtrip fidelity, structure, hostile inputs."""

import struct

import numpy as np
import pytest

from cbor_ld_spark.operators.jpeg_codec import decode_jpeg, encode_jpeg
from cbor_ld_spark.operators.media_codecs import (
    MediaDecodeError,
    jpeg_dimensions,
)

RNG = np.random.default_rng(11)


def _gradient(h, w, nch):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 255 / max(h - 1, 1) + xx * 255 / max(w - 1, 1)) / 2
    return np.stack([np.clip(base + 10 * c, 0, 255) for c in range(nch)],
                    axis=2).astype(np.uint8)


@pytest.mark.parametrize("shape", [(16, 16, 3), (8, 8, 1), (9, 13, 3),
                                   (31, 17, 3), (1, 1, 3), (24, 24, 1)])
def test_jpeg_roundtrip_smooth(shape):
    h, w, nch = shape
    px = _gradient(h, w, nch)
    data = encode_jpeg(px)
    # the independent SOF parser reads our headers
    assert jpeg_dimensions(data) == (w, h)
    back = decode_jpeg(data)
    assert back.shape == (h, w, 3 if nch == 3 else 1)
    # smooth content survives quantization nearly losslessly
    assert np.abs(back[:, :, :nch].astype(float)
                  - px.astype(float)).mean() < 4.0


def test_jpeg_deterministic_and_noise_bounded():
    px = RNG.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
    d1, d2 = encode_jpeg(px), encode_jpeg(px)
    assert d1 == d2
    back = decode_jpeg(d1)
    # noise is JPEG's worst case; Annex-K tables keep MAE well under 50
    assert np.abs(back.astype(float) - px.astype(float)).mean() < 50


def test_jpeg_progressive_rejected():
    px = _gradient(8, 8, 3)
    data = bytearray(encode_jpeg(px))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(MediaDecodeError, match="progressive"):
        decode_jpeg(bytes(data))


def test_jpeg_hostile_dimensions_rejected():
    px = _gradient(8, 8, 3)
    data = bytearray(encode_jpeg(px))
    idx = bytes(data).find(b"\xff\xc0")
    # SOF payload: len(2) prec(1) h(2) w(2): claim a 2^26+ pixel image
    data[idx + 5:idx + 9] = struct.pack(">HH", 1 << 14, 1 << 13)
    with pytest.raises(MediaDecodeError, match="out of bounds"):
        decode_jpeg(bytes(data))


def test_jpeg_truncated_scan_rejected():
    px = _gradient(16, 16, 3)
    data = encode_jpeg(px)
    with pytest.raises(MediaDecodeError):
        decode_jpeg(data[:len(data) // 2])


def test_jpeg_garbage_rejected():
    for bad in (b"", b"\xff\xd8\xff", b"\xff\xd8\xff\xe0" + b"\x00" * 20,
                b"NOTAJPEG"):
        with pytest.raises((MediaDecodeError, ValueError, struct.error,
                            IndexError)):
            decode_jpeg(bad)


try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.integers(0, 10_000), st.integers(0, 255))
    def test_jpeg_bitflip_never_hangs_or_crashes_untyped(pos, val):
        """Mutated valid JPEGs either decode (possibly different pixels)
        or raise a bounded type — never hang, never segfault-shaped."""
        px = _gradient(16, 16, 3)
        data = bytearray(encode_jpeg(px))
        data[pos % len(data)] = val
        try:
            out = decode_jpeg(bytes(data))
            assert out.dtype == np.uint8
        except (MediaDecodeError, ValueError, struct.error, IndexError):
            pass
except ImportError:  # pragma: no cover
    pass


def test_jpeg_decodes_real_world_files():
    """The decoder reads real-world baseline JPEGs (incl. 4:2:0 chroma
    subsampling and grayscale), not just its own encoder's output.
    One externally-encoded fixture is vendored so the check is
    deterministic; system JPEGs add coverage when present."""
    import os

    candidates = [
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "fixtures", "external_2x2.jpg"),
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/"
        "python3.11/test/imghdrdata/python.jpg",
        "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/"
        "share/doc/rust/html/embedded-book/assets/verify.jpeg",
    ]
    present = [p for p in candidates if os.path.exists(p)]
    assert present, "vendored fixture must exist"
    for p in present:
        with open(p, "rb") as f:
            data = f.read()
        px = decode_jpeg(data)
        from cbor_ld_spark.operators.media_codecs import jpeg_dimensions

        w, h = jpeg_dimensions(data)
        assert px.shape[:2] == (h, w)
        assert px.dtype == np.uint8


def test_jpeg_entropy_bomb_quarantines_cheaply():
    """A tiny payload claiming huge-but-under-pixel-cap dimensions must
    be rejected BEFORE the interpreted MCU loop runs (2-bits-per-block
    lower bound), and over-cap block counts get the typed work guard."""
    import time

    px = _gradient(8, 8, 3)
    data = bytearray(encode_jpeg(px))
    idx = bytes(data).find(b"\xff\xc0")
    # claim 4096x4096 (inside the 2^26 pixel cap -> 786k blocks at
    # 4:4:4) with the original ~tiny scan payload
    data[idx + 5:idx + 9] = struct.pack(">HH", 1 << 12, 1 << 12)
    t0 = time.monotonic()
    with pytest.raises(MediaDecodeError,
                       match="out of bounds|truncated JPEG scan"):
        decode_jpeg(bytes(data))
    assert time.monotonic() - t0 < 1.0
    # just under the block cap but scan data far too short: the
    # truncation bound fires in O(1)
    data[idx + 5:idx + 9] = struct.pack(">HH", 1 << 10, 1 << 10)
    t0 = time.monotonic()
    with pytest.raises(MediaDecodeError, match="truncated JPEG scan"):
        decode_jpeg(bytes(data))
    assert time.monotonic() - t0 < 1.0


def test_jpeg_bad_sampling_factors_typed_error():
    """Non-divisor sampling factors (3 vs max 2 would repeat(0)) raise a
    typed MediaDecodeError instead of a downstream numpy shape error."""
    px = _gradient(16, 16, 3)
    data = bytearray(encode_jpeg(px))
    idx = bytes(data).find(b"\xff\xc0")
    # SOF: len(2) prec(1) h(2) w(2) ncomp(1) then per-comp (id, HV, tq);
    # our encoder writes 4:4:4 (HV=0x11 everywhere) — set comp0 to 3x3
    # and leave the rest at 1x1 -> hmax=3, 3%1==0 fine, so instead set
    # comp1 to 2x2 with comp0 3x3: hmax=3, 3%2 != 0
    data[idx + 11] = 0x33
    data[idx + 14] = 0x22
    with pytest.raises(MediaDecodeError, match="sampling factors"):
        decode_jpeg(bytes(data))
