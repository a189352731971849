"""Deterministic per-document term-id allocator.

Semantics mirror the reference's ``IdAllocator``/``IdMap`` pair
(reference: src/id/alloc.rs:3-40, src/id/map.rs:4-57):

* a static parent layer holds the fixed keyword map,
* per-document allocations start at ``FIRST_CUSTOM_TERM_ID`` (100) and
  step by 2 — even id = singular key, odd id = ``id+1`` = plural
  (array-valued) key,
* allocation is idempotent per term name.

Because allocation order is a pure function of the document's context
chain (contexts processed in document order, terms allocated in sorted
order — reference: src/transform.rs:305-317), the encoder and decoder
independently re-derive identical tables, which is exactly what makes the
kernel embarrassingly parallel across a corpus: no shared state.
"""

from __future__ import annotations

from .keywords import FIRST_CUSTOM_TERM_ID, KEYWORDS, KEYWORDS_BY_ID


class IdAllocator:
    __slots__ = ("term_to_id", "id_to_term", "next_id")

    def __init__(self) -> None:
        self.term_to_id: dict[str, int] = {}
        self.id_to_term: dict[int, str] = {}
        self.next_id = FIRST_CUSTOM_TERM_ID

    def encode_term(self, term: str, plural: bool) -> int | None:
        tid = self.term_to_id.get(term)
        if tid is None:
            tid = KEYWORDS.get(term)
        if tid is None:
            return None
        return tid + 1 if plural else tid

    def decode_term(self, tid: int) -> tuple[str, bool] | None:
        singular = tid if tid % 2 == 0 else tid - 1
        term = self.id_to_term.get(singular)
        if term is None:
            term = KEYWORDS_BY_ID.get(singular)
        if term is None:
            return None
        return term, singular != tid

    def allocate(self, term: str) -> int:
        tid = self.term_to_id.get(term)
        if tid is None:
            tid = KEYWORDS.get(term)
        if tid is not None:
            return tid
        tid = self.next_id
        self.next_id += 2
        self.term_to_id[term] = tid
        self.id_to_term[tid] = term
        return tid
