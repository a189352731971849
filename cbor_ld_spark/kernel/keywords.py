"""Static CBOR-LD keyword table and allocator constants.

The 27 JSON-LD keywords are pinned to fixed even ids (reference:
src/keywords.rs:5-39 and the CBOR-LD spec's registered keyword table):
``@context``=0, ``@type``=2, ``@id``=4, ``@value``=6, then alphabetical.
Ids <= 24 fit in a single CBOR byte.  Custom (context-defined) terms are
allocated even ids starting at 100 (reference: src/keywords.rs:41).
"""

from __future__ import annotations

KEYWORDS: dict[str, int] = {
    "@context": 0,
    "@type": 2,
    "@id": 4,
    "@value": 6,
    "@direction": 8,
    "@graph": 10,
    "@included": 12,
    "@index": 14,
    "@json": 16,
    "@language": 18,
    "@list": 20,
    "@nest": 22,
    "@reverse": 24,
    "@base": 26,
    "@container": 28,
    "@default": 30,
    "@embed": 32,
    "@explicit": 34,
    "@none": 36,
    "@omitDefault": 38,
    "@prefix": 40,
    "@preserve": 42,
    "@protected": 44,
    "@requireAll": 46,
    "@set": 48,
    "@version": 50,
    "@vocab": 52,
}

KEYWORDS_BY_ID: dict[int, str] = {v: k for k, v in KEYWORDS.items()}

FIRST_CUSTOM_TERM_ID = 100

# All JSON-LD 1.1 keywords (W3C JSON-LD 1.1 §1.7) — used to filter term
# allocation (reference: src/transform.rs:313-317 filters `is_keyword`).
ALL_KEYWORDS = frozenset(KEYWORDS) | {
    "@annotation",
    "@any",
    "@filter",
    "@import",
    "@propagate",
    "@protected",
    "@version",
}


def is_keyword(term: str) -> bool:
    return term in ALL_KEYWORDS
