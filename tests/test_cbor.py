"""CBOR writer/reader unit tests incl. hypothesis round-trip.

The writer must match ciborium's canonical choices (definite lengths,
shortest-int heads) for golden-byte compatibility (reference:
src/encode/mod.rs:87-91).
"""

import pytest
from hypothesis import given, strategies as st

from cbor_ld_spark.kernel.cbor import CborMap, CborTag, dumps, loads


@pytest.mark.parametrize(
    "value,hex_",
    [
        (0, "00"),
        (23, "17"),
        (24, "1818"),
        (255, "18ff"),
        (256, "190100"),
        (65535, "19ffff"),
        (65536, "1a00010000"),
        (-1, "20"),
        (-25, "3818"),
        (True, "f5"),
        (False, "f4"),
        (None, "f6"),
        ("a", "6161"),
        (b"\x01\x02", "420102"),
        ([1, 2], "820102"),
        (1.5, "f93e00"),  # half-precision lossless
        (CborTag(0x0601, 1), "d9060101"),
    ],
)
def test_known_encodings(value, hex_):
    assert dumps(value).hex() == hex_


def test_map_order_preserved():
    m = CborMap([(2, "b"), (1, "a")])
    assert dumps(m).hex() == "a202616201 6161".replace(" ", "")
    assert loads(dumps(m)) == m


scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False),
    st.text(max_size=40),
    st.binary(max_size=40),
)


@given(st.recursive(scalars, lambda c: st.lists(c, max_size=4), max_leaves=20))
def test_roundtrip(value):
    assert loads(dumps(value)) == value


def test_trailing_bytes_rejected():
    with pytest.raises(ValueError):
        loads(b"\x00\x00")


def test_truncated_rejected():
    with pytest.raises(ValueError):
        loads(b"\x19\x01")
