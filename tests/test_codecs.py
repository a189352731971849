"""Codec unit tests (IRI codecs, multibase, xsd date/dateTime).

Cases mirror the reference's micro tests (src/codecs/iri/data.rs:101-181)
plus round-trip properties over the payload shapes seen in the fixtures.
"""

import pytest

from cbor_ld_spark.kernel import codecs
from cbor_ld_spark.kernel.multiformats import (
    base58btc_decode,
    base58btc_encode,
    multibase_decode,
    multibase_encode,
)


# --- data URL parser (reference: src/codecs/iri/data.rs:101-181) -----------

@pytest.mark.parametrize(
    "url,expected",
    [
        ("invalid", None),
        (",valid", ("", False, "valid")),
        (";base64,", ("", True, "")),
        (";base64,data", ("", True, "data")),
        ("image/jpeg,data", ("image/jpeg", False, "data")),
        ("image/jpeg;base64,data", ("image/jpeg", True, "data")),
        ("image/jpeg;base64,", ("image/jpeg", True, "")),
    ],
)
def test_data_url_parser(url, expected):
    assert codecs._parse_data_url(url) == expected


def test_data_url_invalid_base64_falls_back_verbatim():
    # the prc fixture's truncated base64 payload ('...' is not base64)
    suffix = "image/png;base64,iVBORw0KGgo...kJggg=="
    assert codecs.DataUrlCodec.encode(suffix) == [suffix]


# --- base58 / multibase -----------------------------------------------------

def test_base58_roundtrip():
    for raw in [b"", b"\x00", b"\x00\x00abc", bytes(range(32))]:
        assert base58btc_decode(base58btc_encode(raw)) == raw


def test_multibase_z_roundtrip():
    s = "z6MkkUbCFazdoducKf8SUye7cAxuicMdDBhXKWuTEuGA3jQF"
    code, raw = multibase_decode(s)
    assert code == "z"
    assert multibase_encode(code, raw) == s


def test_multibase_u_roundtrip():
    code, raw = multibase_decode("uggAg")
    assert code == "u"
    assert multibase_encode("u", raw) == "uggAg"


# --- IRI codecs -------------------------------------------------------------

@pytest.mark.parametrize(
    "iri",
    [
        "https://issuer.oidp.uscis.gov/credentials/83627465",
        "http://example.com/a?b=c#d",
        "urn:uuid:188e8450-269e-11eb-b545-d3692cf35398",
        "did:key:z6MkkUbCFazdoducKf8SUye7cAxuicMdDBhXKWuTEuGA3jQF",
        "did:key:z6MkkUbCFazdoducKf8SUye7cAxuicMdDBhXKWuTEuGA3jQF#z6MkkUbCFazdoducKf8SUye7cAxuicMdDBhXKWuTEuGA3jQF",
        "did:example:28394728934792387",  # unknown scheme -> verbatim
    ],
)
def test_iri_roundtrip(iri):
    assert codecs.decode_iri(codecs.encode_iri(iri)) == iri


def test_urn_uuid_compact():
    enc = codecs.encode_iri("urn:uuid:188e8450-269e-11eb-b545-d3692cf35398")
    assert enc[0] == 3 and len(enc[1]) == 16


def test_unknown_scheme_stays_text():
    assert codecs.encode_iri("did:example:123") == "did:example:123"


# --- xsd date / dateTime ----------------------------------------------------

@pytest.mark.parametrize(
    "value,expected",
    [
        ("2019-12-03T12:19:52Z", 1575375592),
        ("2021-03-24T20:03:03Z", 1616616183),
        ("1970-01-01T00:00:00Z", 0),
        ("1969-12-31T23:59:59Z", -1),
        ("2020-01-01T01:00:00+01:00", 1577836800),
        ("2015-01-01T00:00:00", "2015-01-01T00:00:00"),  # no offset -> text
    ],
)
def test_xsd_date_time_encode(value, expected):
    assert codecs.encode_xsd_date_time(value) == expected


def test_xsd_date_time_millis():
    assert codecs.encode_xsd_date_time("2020-01-01T00:00:00.500Z") == [1577836800, 500]
    assert codecs.decode_xsd_date_time([1577836800, 500]) == "2020-01-01T00:00:00.5Z"


def test_xsd_date_time_decode_renders_utc():
    assert codecs.decode_xsd_date_time(1575375592) == "2019-12-03T12:19:52Z"


def test_xsd_date():
    assert codecs.encode_xsd_date("2001-10-26") == "2001-10-26"
    assert codecs.encode_xsd_date("2001-10-26Z") == 1004054400
    assert codecs.decode_xsd_date(1004054400) == "2001-10-26Z"


# --- multibase type codec ---------------------------------------------------

def test_multibase_codec_roundtrip():
    v = "z4mAs9uHU16jR4xwPcbhHyRUc6BbaiJQE5MJwn3PCWkRXsriK9AMrQQMbjzG9XXFPNgngmQXHKUz23WRSu9jSxPCF"
    enc = codecs.encode_multibase(v)
    assert isinstance(enc, bytes) and enc[0] == ord("z")
    assert codecs.decode_multibase(enc) == v
