"""Context-processing hardening: @protected enforcement and per-loader
cache scoping (reference: json-ld crate's protected-term semantics)."""

import pytest

from cbor_ld_spark.kernel.context import (
    EMPTY_CONTEXT,
    process_context,
)
from cbor_ld_spark.kernel.errors import ContextError
from cbor_ld_spark.kernel.loader import StaticLoader

LOADER = StaticLoader({})

PROTECTED_CTX = {"@protected": True, "name": "https://ex.org/name"}


def test_protected_term_differing_redefinition_raises():
    active = process_context(EMPTY_CONTEXT, PROTECTED_CTX, LOADER)
    with pytest.raises(ContextError) as e:
        process_context(active, {"name": "https://evil.example/name"}, LOADER)
    assert e.value.kind == "ProtectedTermRedefinition"


def test_protected_term_identical_redefinition_allowed():
    active = process_context(EMPTY_CONTEXT, PROTECTED_CTX, LOADER)
    out = process_context(active, {"name": "https://ex.org/name"}, LOADER)
    assert out.get("name").iri == "https://ex.org/name"


def test_protected_term_override_via_property_scope():
    active = process_context(EMPTY_CONTEXT, PROTECTED_CTX, LOADER)
    out = process_context(active, {"name": "https://other.example/name"},
                          LOADER, override_protected=True)
    assert out.get("name").iri == "https://other.example/name"


def test_unprotected_term_redefinition_allowed():
    active = process_context(
        EMPTY_CONTEXT, {"name": "https://ex.org/name"}, LOADER)
    out = process_context(active, {"name": "https://other.example/name"},
                          LOADER)
    assert out.get("name").iri == "https://other.example/name"


def test_hostile_document_cannot_override_protected_credential_term():
    """End-to-end: a doc embedding a context that redefines a protected
    term must quarantine (error), matching the reference's behavior."""
    from cbor_ld_spark.kernel import CborLdError, encode_document

    doc = {
        "@context": [
            "https://www.w3.org/2018/credentials/v1",
            {"issuer": "https://evil.example/attacker-controlled"},
        ],
        "type": "VerifiableCredential",
        "issuer": "https://evil.example/x",
    }
    with pytest.raises(CborLdError):
        encode_document(doc)


def test_process_cache_scoped_per_loader():
    """Two loaders resolving the same URL to different documents must not
    share memoized ActiveContexts."""
    url = "https://ctx.example/v1"
    loader_a = StaticLoader({url: {"@context": {"n": "https://a.example/n"}}})
    loader_b = StaticLoader({url: {"@context": {"n": "https://b.example/n"}}})
    out_a = process_context(EMPTY_CONTEXT, url, loader_a)
    out_b = process_context(EMPTY_CONTEXT, url, loader_b)
    assert out_a.get("n").iri == "https://a.example/n"
    assert out_b.get("n").iri == "https://b.example/n"


def test_import_merges_remote_definitions():
    """@import (JSON-LD 1.1 §4.1.2 step 5.6): imported context is the
    base; the importing context's own entries win."""
    loader = StaticLoader({
        "https://ctx.example/base": {"@context": {
            "name": "https://base.example/name",
            "age": "https://base.example/age"}},
    })
    out = process_context(EMPTY_CONTEXT, {
        "@import": "https://ctx.example/base",
        "name": "https://override.example/name",
    }, loader)
    assert out.get("name").iri == "https://override.example/name"
    assert out.get("age").iri == "https://base.example/age"


def test_import_rejects_bad_targets():
    loader = StaticLoader({
        "https://ctx.example/arr": {"@context": ["https://x.example/a"]},
        "https://ctx.example/nested": {"@context": {
            "@import": "https://ctx.example/arr"}},
    })
    with pytest.raises(ContextError):  # array target
        process_context(EMPTY_CONTEXT,
                        {"@import": "https://ctx.example/arr"}, loader)
    with pytest.raises(ContextError):  # nested @import
        process_context(EMPTY_CONTEXT,
                        {"@import": "https://ctx.example/nested"}, loader)
    with pytest.raises(ContextError):  # non-string value
        process_context(EMPTY_CONTEXT, {"@import": 7}, loader)


def test_identical_redefinition_retains_protection():
    """Review r2: an identical-but-unprotected redefinition must keep the
    protected flag, or a later differing redefinition slips through."""
    active = process_context(EMPTY_CONTEXT, [
        {"@protected": True, "name": "https://ex.org/name"},
        {"name": "https://ex.org/name"},  # identical, no @protected
    ], LOADER)
    assert active.get("name").protected
    with pytest.raises(ContextError) as e:
        process_context(active, {"name": "https://evil.example/n"}, LOADER)
    assert e.value.kind == "ProtectedTermRedefinition"


def test_keyword_like_id_does_not_strip_protected_term():
    """Review r2: {"term": {"@id": "@keywordlike"}} is ignored per spec,
    but must not delete the pre-existing (protected) definition."""
    active = process_context(EMPTY_CONTEXT, [
        {"@protected": True, "name": "https://ex.org/name"},
        {"name": {"@id": "@notakeyword"}},
    ], LOADER)
    d = active.get("name")
    assert d is not None and d.iri == "https://ex.org/name" and d.protected


def test_loader_token_slotted_loader_no_weakref():
    """A loader whose class uses __slots__ without __weakref__ rejects
    both attribute assignment and weak references; _loader_token must
    fall back to unmemoized fresh tokens rather than raise (ADVICE r3)."""
    from cbor_ld_spark.kernel.context import _loader_token

    class Slotted:
        __slots__ = ("docs",)

        def __init__(self):
            self.docs = {}

    s = Slotted()
    t1 = _loader_token(s)
    t2 = _loader_token(s)
    assert isinstance(t1, int) and isinstance(t2, int)
    # fresh tokens are correct (cache misses), just unmemoized
    assert t1 != t2

    class Plain:
        pass

    p = Plain()
    assert _loader_token(p) == _loader_token(p)
