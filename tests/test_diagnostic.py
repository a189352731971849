"""CBOR diagnostic-notation renderer (reference: src/diagnostic.rs)."""

from cbor_ld_spark.kernel.cbor import CborMap, CborTag, loads
from cbor_ld_spark.kernel.diagnostic import diagnostic


def test_scalars():
    assert diagnostic(None) == "null"
    assert diagnostic(True) == "true"
    assert diagnostic(42) == "42"
    assert diagnostic("a\"b") == '"a\\"b"'
    assert diagnostic(b"\x01\xff") == "h'01ff'"


def test_tagged_map():
    v = CborTag(0x0601, CborMap([(0, "ctx"), (100, [1, 2])]))
    out = diagnostic(v)
    assert out.startswith("1537({")
    assert '0: "ctx"' in out
    assert "100: [" in out


def test_renders_real_encoding():
    import os

    samples = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "cbor_ld_spark", "fixtures", "samples")
    with open(os.path.join(samples, "note.cbor.hex")) as f:
        tree = loads(bytes.fromhex(f.read().strip()))
    out = diagnostic(tree)
    assert "https://www.w3.org/ns/activitystreams" in out
    assert out.startswith("1537(")


def test_byte_diff_states():
    from cbor_ld_spark.kernel.diagnostic import byte_diff

    # equal
    assert byte_diff(b"\x01\x02", b"\x01\x02") == "0102"
    # differing middle byte
    assert byte_diff(b"\x01\xff\x03", b"\x01\x02\x03") == "01!{ff}03"
    # expected longer -> missing tail (expected's bytes shown)
    assert byte_diff(b"\x01", b"\x01\x02\x03") == "01-{0203}"
    # value longer -> added tail
    assert byte_diff(b"\x01\x02\x03", b"\x01") == "01+{0203}"
    # state transitions merge into runs
    assert byte_diff(b"\xaa\xbb\x0c", b"\x1a\x2b\x0c") == "!{aabb}0c"
    # color mode emits ANSI and resets
    s = byte_diff(b"\x01\xff", b"\x01\x02", color=True)
    assert s.startswith("\x1b[32m01") and s.endswith("\x1b[0m")
    assert "\x1b[31mff" in s
    # both empty
    assert byte_diff(b"", b"") == ""
