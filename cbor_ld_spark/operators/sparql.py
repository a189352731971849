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
* path     := unit ('/' unit)*        (SEQUENCE)
* unit     := (alts | '(' path ')') mod?
  — a parenthesised GROUP contains a whole sub-path and may nest;
  ``mod`` is one trailing '+', '*' or '?' and applies to the WHOLE
  unit.  Alternation BETWEEN groups (``(p/q)|r``) is outside this
  subset and rejected loudly.
* alts     := atom ('|' atom)*        (ALTERNATION within a unit)
* atom     := '^'? '!'? ('<'iri'>' | bare-token)
  — '^' inverts the atom, '!' on every atom of a step makes it a
  negated property set (match_path enforces the no-mixing rule).

IRIs inside ``<>`` may contain any character except ``>`` — in
particular ``/``, so ``<https://...>/<https://...>`` tokenizes
correctly (the pre-r7 string-split parser broke on https IRIs).
Bare tokens end at whitespace or any of ``()/|+*?^!``.
"""

from __future__ import annotations

import shlex

_MODS = {"+": "plus", "*": "star", "?": "opt"}
_PUNCT = "()/|+*?"


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


def _tokenize_path(expr: str) -> list:
    """Tokens: single punctuation chars from ``()/|+*?`` and
    ``('atom', value)`` pairs with the ``^``/``!`` prefix folded in.
    ``<>``-wrapped IRIs are opaque (may contain '/', '|', parens)."""
    toks: list = []
    i, n = 0, len(expr)
    while i < n:
        c = expr[i]
        if c.isspace():
            i += 1
            continue
        if c in _PUNCT:
            toks.append(c)
            i += 1
            continue
        prefix = ""
        if c == "^":
            prefix, i = "^", i + 1
        if i < n and expr[i] == "!":
            if prefix:
                raise ValueError("'^' on a negated (!) atom is not "
                                 "supported in this subset")
            prefix, i = "!", i + 1
        if i < n and expr[i] == "<":
            k = expr.find(">", i)
            if k < 0:
                raise ValueError(f"unterminated '<' in path {expr!r}")
            atom = expr[i + 1:k]
            i = k + 1
        else:
            j = i
            while i < n and expr[i] not in _PUNCT + "^!<" \
                    and not expr[i].isspace():
                i += 1
            atom = expr[j:i]
        if not atom:
            raise ValueError(f"empty path atom in {expr!r}")
        toks.append(("atom", prefix + atom))
    return toks


def _parse_unit(toks: list, pos: int) -> tuple[tuple, int]:
    """One unit: an atom alternation or a parenthesised group, with
    an optional trailing modifier."""
    if pos >= len(toks) or toks[pos] in ("/", "|"):
        raise ValueError("empty step in path")
    if toks[pos] == "(":
        sub, pos = _parse_seq(toks, pos + 1)
        if pos >= len(toks) or toks[pos] != ")":
            raise ValueError("unbalanced '(' in path")
        pos += 1
        mod = "one"
        if pos < len(toks) and toks[pos] in _MODS:
            mod, pos = _MODS[toks[pos]], pos + 1
        if pos < len(toks) and toks[pos] == "|":
            raise ValueError("alternation of parenthesised groups is "
                             "outside this subset")
        return (sub, mod), pos
    alts = []
    while True:
        t = toks[pos]
        if not (isinstance(t, tuple) and t[0] == "atom"):
            if t == "(":
                raise ValueError("alternation of parenthesised groups "
                                 "is outside this subset")
            raise ValueError(f"unexpected {t!r} in path")
        alts.append(t[1])
        pos += 1
        if pos < len(toks) and toks[pos] == "|":
            pos += 1
            if pos >= len(toks):
                raise ValueError("dangling '|' in path")
            continue
        break
    mod = "one"
    if pos < len(toks) and toks[pos] in _MODS:
        mod, pos = _MODS[toks[pos]], pos + 1
    return ((alts if len(alts) > 1 else alts[0]), mod), pos


def _parse_seq(toks: list, pos: int) -> tuple[list[tuple], int]:
    steps = []
    while True:
        step, pos = _parse_unit(toks, pos)
        steps.append(step)
        if pos < len(toks) and toks[pos] == "/":
            pos += 1
            continue
        return steps, pos


def parse_path(expr: str) -> list[tuple]:
    """A path expression -> match_path steps.

    ``"<p>/<q>|<r>+/^<s>"`` parses to
    ``[(p, 'one'), ([q, r], 'plus'), ('^' + s, 'one')]``;
    ``"(<p>/<q>)+"`` parses to the nested group step
    ``([(p, 'one'), (q, 'one')], 'plus')`` (groups nest)."""
    toks = _tokenize_path(expr)
    if not toks:
        raise ValueError("empty path expression")
    steps, pos = _parse_seq(toks, 0)
    if pos != len(toks):
        raise ValueError(f"trailing {toks[pos]!r} in path {expr!r} "
                         "(unbalanced ')'?)")
    return steps
