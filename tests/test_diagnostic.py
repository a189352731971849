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
