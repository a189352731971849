"""Text syntax for the query layer: triple patterns and property paths.

A small, documented SPARQL-subset parser so the consumption layer
(``operators/bgp.match_bgp`` / ``match_path``) is scriptable from the
CLI (``jobs/kg_query.py``) without writing Python — the counterpart of
the reference CLI's encode/decode surface for the graph we build.

Grammar (subset, stated precisely):

* pattern  := term term term          (one line / one --pattern arg)
* term     := '?'name | '<'iri'>' | bare-token | '"'literal'"'
  — ``<>`` and quotes are stripped; everything matches string-level
  against the triples table, same semantics as match_bgp.
* path     := step ('/' step)*        (SEQUENCE)
* step     := atom ('|' atom)* mod?   (ALTERNATION within a step;
  ``mod`` is one trailing '+', '*' or '?' and applies to the WHOLE
  step — attach-to-atom grouping needs parentheses, which this subset
  intentionally omits: parenthesised paths are rejected loudly)
* atom     := '^'? '!'? ('<'iri'>' | bare-token)
  — '^' inverts the atom, '!' on every atom of a step makes it a
  negated property set (match_path enforces the no-mixing rule).
"""

from __future__ import annotations

import shlex

_MODS = {"+": "plus", "*": "star", "?": "opt"}


def parse_term(tok: str) -> str:
    """One pattern term: ?var kept verbatim (match_bgp's variable
    marker), <iri> and "literal" unwrapped, bare tokens as-is."""
    if not tok:
        raise ValueError("empty pattern term")
    if tok.startswith("?"):
        if len(tok) == 1:
            raise ValueError("bare '?' variable")
        return tok
    if tok.startswith("<") and tok.endswith(">"):
        return tok[1:-1]
    return tok


def parse_pattern(text: str) -> tuple[str, str, str]:
    """One 'subj pred obj' line -> a match_bgp pattern triple.
    Quoted literals may contain spaces (shlex rules); a trailing '.'
    token (SPARQL statement dot) is tolerated."""
    toks = shlex.split(text)
    if toks and toks[-1] == ".":
        toks = toks[:-1]
    if len(toks) != 3:
        raise ValueError(
            f"pattern must have exactly 3 terms: {text!r}")
    return tuple(parse_term(t) for t in toks)  # type: ignore[return-value]


def _parse_atom(tok: str) -> str:
    prefix = ""
    if tok.startswith("^"):
        prefix, tok = "^", tok[1:]
    if tok.startswith("!"):
        if prefix:
            raise ValueError("'^' on a negated (!) atom is not "
                             "supported in this subset")
        prefix, tok = "!", tok[1:]
    if tok.startswith("<") and tok.endswith(">"):
        tok = tok[1:-1]
    if not tok:
        raise ValueError("empty path atom")
    return prefix + tok


def parse_path(expr: str) -> list[tuple]:
    """A path expression -> match_path steps.

    ``"<p>/<q>|<r>+/^<s>"`` parses to
    ``[(p, 'one'), ([q, r], 'plus'), ('^' + s, 'one')]``.
    """
    if "(" in expr or ")" in expr:
        raise ValueError(
            "parenthesised paths are outside this subset — split the "
            "query into multiple steps instead")
    steps: list[tuple] = []
    for raw in expr.split("/"):
        raw = raw.strip()
        if not raw:
            raise ValueError(f"empty step in path {expr!r}")
        mod = "one"
        if raw[-1] in _MODS:
            mod = _MODS[raw[-1]]
            raw = raw[:-1].rstrip()
        alts = [_parse_atom(a.strip()) for a in raw.split("|")]
        if len(alts) == 1:
            steps.append((alts[0], mod))
        else:
            steps.append((alts, mod))
    return steps
