"""Column-level codec operators (byte surface: encode/hex/decode)."""

import os

from pyspark.sql import functions as F

FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "cbor_ld_spark", "fixtures", "samples",
)


def _corpus(spark):
    rows = []
    for name in ["note", "truage", "uncompressible"]:
        with open(os.path.join(FIXTURES, f"{name}.jsonld")) as f:
            rows.append((name, f.read()))
    return spark.createDataFrame(rows, "name string, content string")


def test_encode_column_matches_golden(spark):
    from cbor_ld_spark.operators.codec_ops import encode_column

    out = {r["name"]: r for r in encode_column(_corpus(spark)).collect()}
    golden = open(os.path.join(FIXTURES, "note.cbor.hex")).read().strip()
    assert out["note"]["cbor_hex"] == golden
    assert out["truage"]["encode_error"] is None
    assert out["uncompressible"]["encode_error"] == "InvalidContextEntry"
    assert out["uncompressible"]["cbor"] is None


def test_hex_roundtrip_surface(spark):
    from cbor_ld_spark.operators.codec_ops import hex_roundtrip_check

    out = hex_roundtrip_check(_corpus(spark))
    ok = out.filter(F.col("hex_roundtrip_ok")).count()
    assert ok == 2  # note + truage; uncompressible filtered as unencodable
