"""Basic-graph-pattern (BGP) matching over the triples table.

The KG-consumption primitive: a conjunctive set of (subj, pred, obj)
triple patterns — terms starting with ``?`` are variables, everything
else matches literally — compiled into DataFrame self-joins over the
materialized triples table.  This is the SPARQL-BGP core re-expressed
Spark-first (the reference emits the graph; consuming it is the north
rule's "graph materialize" payoff): each pattern becomes a filtered
column-pruned scan, shared variables become equi-join keys, and
Catalyst + AQE pick join order, broadcast sides and skew splits.

Scale shape: every pattern's constant positions are pushed down to the
parquet/bucketed scan (predicate-constant patterns prune to a single
predicate's row group); the join keys are realized IRI strings (uniform
after distinct); selective patterns produce small frames that AQE
broadcasts.  No driver-side row materialization — the result is a plain
DataFrame.

Semantics notes (documented, tested):
* matching is string-level on (subj, pred, obj) — datatype/lang filters
  can be layered as ordinary DataFrame filters on the pattern frame;
* a variable repeated INSIDE one pattern (e.g. ``(?x, p, ?x)``) becomes
  an intra-row equality filter;
* a fully-ground pattern (no variables) acts as an EXISTS guard: the
  result is empty unless the triple occurs (implemented as a lazy
  crossJoin with ``limit(1)`` of the matching scan — no driver action);
* ``distinct=True`` (default) collapses per-document duplicate
  assertions — SPARQL set semantics over the corpus-level graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_POSITIONS = ("subj", "pred", "obj")


def _pattern_frame(triples: DataFrame, pat, i: int, var_order: list[str]):
    """Filtered + variable-renamed frame for one triple pattern;
    appends new variables to var_order (first-appearance order).

    A 4-tuple ``(subj, pred, obj, graph)`` is a QUAD pattern (SPARQL
    §13.3 GRAPH): the 4th term matches the triple's named-graph label
    — a variable binds it, a constant filters on it — and the pattern
    is restricted to NAMED graphs (``graph != ''``; '' marks the
    default graph in the realized triples)."""
    if len(pat) not in (3, 4):
        raise ValueError(f"pattern {i} must be a (subj, pred, obj) "
                         f"triple or (subj, pred, obj, graph) quad, "
                         f"got {pat!r}")
    filters = []
    if len(pat) == 4:
        filters.append(F.col("graph") != F.lit(""))
    rename: dict[str, str] = {}
    seen: dict[str, str] = {}
    positions = _POSITIONS if len(pat) == 3 else _POSITIONS + ("graph",)
    for pos, term in zip(positions, pat):
        if term.startswith("?"):
            var = term[1:]
            if not var:
                raise ValueError(f"pattern {i}: bare '?' variable")
            if var.startswith("_"):
                # '_'-prefixed columns are reserved for the internal
                # EXISTS-guard markers (_exists_i); a '?_x' variable
                # would be silently excluded from the equi-join keys
                # (cross join / ambiguous-column error instead of a
                # typed one), so reject loudly here.
                raise ValueError(
                    f"pattern {i}: variable name {term!r} may not "
                    "start with '_' (reserved for internal columns)")
            if var in seen:
                filters.append(F.col(pos) == F.col(seen[var]))
            else:
                seen[var] = pos
                rename[pos] = var
                if var not in var_order:
                    var_order.append(var)
        else:
            filters.append(F.col(pos) == F.lit(term))
    frame = triples
    for c in filters:
        frame = frame.filter(c)
    if rename:
        frame = frame.select(
            *[F.col(p).alias(v) for p, v in rename.items()])
    else:
        # ground pattern: EXISTS guard — 1 row if present, 0 if not
        frame = frame.select(F.lit(1).alias(f"_exists_{i}")).limit(1)
    return frame


def _path_var(term: str, k: int) -> str | None:
    """'?name' -> 'name' with the same validation as pattern vars;
    None for a ground term."""
    if not term.startswith("?"):
        return None
    var = term[1:]
    if not var:
        raise ValueError(f"path pattern {k}: bare '?' variable")
    if var.startswith("_"):
        raise ValueError(
            f"path pattern {k}: variable name {term!r} may not start "
            "with '_' (reserved for internal columns)")
    return var


def _path_frame(triples: DataFrame, steps: list[tuple], s: str, o: str,
                k: int, var_order: list[str]) -> DataFrame:
    """A property-path pattern used INSIDE a BGP (r7): evaluates the
    path relation via ``match_path`` — the SEEDED tier when an
    endpoint is ground — and shapes it like a pattern frame (one
    column per endpoint variable; a fully-ground path becomes a lazy
    EXISTS guard; a repeated variable an intra-row equality)."""
    s_var, o_var = _path_var(s, k), _path_var(o, k)
    rel = match_path(triples, steps,
                     src=None if s_var is not None else s,
                     dst=None if o_var is not None else o)
    if s_var is None and o_var is None:
        # fully-ground path: EXISTS guard, no driver action
        return rel.select(F.lit(1).alias(f"_exists_path{k}")).limit(1)
    if s_var is not None and s_var == o_var:
        frame = (rel.filter(F.col("src") == F.col("dst"))
                 .select(F.col("src").alias(s_var)).distinct())
        if s_var not in var_order:
            var_order.append(s_var)
        return frame
    cols = []
    for var, pos in ((s_var, "src"), (o_var, "dst")):
        if var is not None:
            cols.append(F.col(pos).alias(var))
            if var not in var_order:
                var_order.append(var)
    return rel.select(*cols).distinct()


def _split_conjuncts(expr: str) -> list[str]:
    """Split a boolean SQL expression on its TOP-LEVEL ``AND``s
    (quoted literals and parenthesised groups opaque) — the pieces a
    filter may apply independently."""
    parts: list[str] = []
    depth = start = i = 0
    n = len(expr)
    while i < n:
        c = expr[i]
        if c in "\"'":
            j = expr.find(c, i + 1)
            if j < 0:
                break  # unterminated literal: leave it to F.expr
            i = j
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif (depth == 0 and expr[i:i + 3].upper() == "AND"
              and (i == 0 or not (expr[i - 1].isalnum()
                                  or expr[i - 1] == "_"))
              and (i + 3 >= n or not (expr[i + 3].isalnum()
                                      or expr[i + 3] == "_"))):
            parts.append(expr[start:i])
            i += 3
            start = i
            continue
        i += 1
    parts.append(expr[start:])
    return [p.strip() for p in parts if p.strip()]


def match_bgp(triples: DataFrame,
              patterns: list[tuple[str, str, str]],
              optional: list[tuple[str, str, str]] | None = None,
              distinct: bool = True,
              filters: list[str] | None = None,
              not_exists: list[tuple[str, str, str]] | None = None,
              sources: list[DataFrame] | None = None,
              unbound_compat: bool = True,
              paths: list[tuple] | None = None,
              binds: list[tuple[str, str]] | None = None,
              exists: list[tuple[str, str, str]] | None = None) -> DataFrame:
    """Match a conjunctive BGP; returns one column per variable, in
    first-appearance order (required patterns first, then optionals).

    ``filters`` are SPARQL-FILTER-style boolean SQL expressions over
    the bound variables (e.g. ``"cast(age as int) >= 21"``) — a row
    must satisfy every filter.  They compile to ordinary Catalyst
    predicates, so a filter on a single pattern's variable is pushed
    below the joins.  A filter that references a variable an OPTIONAL
    introduces defers until after the optional left joins (SPARQL
    §18.5 group scoping — ``isnotnull(x)`` over an optional var is the
    BOUND idiom, NULL comparisons give SPARQL's error->false); all
    other filters apply before the optionals and keep their pushdown.

    ``binds`` (r8 — SPARQL BIND): ``(sql_expr, alias)`` pairs computed
    over the bindings after the required patterns/paths join and
    BEFORE the filters, in order (a later bind or filter may reference
    an earlier bind's alias).  The alias must be FRESH — rebinding a
    bound variable is an error, per SPARQL 1.1 §10.1.  Binds are plain
    projections, so Catalyst folds a filter on a bind alias through
    the projection and still pushes the underlying predicate to the
    pattern scan.

    ``exists`` patterns (r8 — SPARQL ``FILTER EXISTS``) KEEP only the
    bindings for which the pattern matches: a ``left_semi`` join on
    the shared variables, the positive twin of ``not_exists`` with the
    identical connectedness rule (a disconnected EXISTS is rejected
    loudly).  Fresh variables inside are existential and introduce no
    columns.  Semi-join, so the bindings' multiplicity never inflates
    and the probe side streams — same scale shape as the anti join.

    ``not_exists`` patterns implement SPARQL ``FILTER NOT EXISTS`` /
    ``MINUS`` for the connected case: bindings for which the pattern
    matches are dropped via a ``left_anti`` join on the shared
    variables.  Each pattern must share at least one variable with the
    required patterns; its other positions may be constants or fresh
    variables (fresh variables are existential — any match removes the
    binding).  Note the SPARQL corner where MINUS and FILTER NOT EXISTS
    differ (disconnected patterns) is rejected loudly here, so the two
    coincide on everything this accepts.

    ``paths`` (r7) — property-path patterns INSIDE the BGP: each entry
    ``(steps, subj, obj)`` where steps is a ``match_path`` step list
    and subj/obj are ``'?var'`` or ground terms.  The path relation is
    evaluated (the SEEDED frontier tier when an endpoint is ground)
    and joined into the bindings exactly like a pattern frame — so
    ``?cred vc?/issuer ?i . ?cred rdf:type ?t`` is one query.  Paths
    join after the required patterns (their variables order after
    pattern variables); fully-ground paths act as EXISTS guards and a
    repeated endpoint variable as an intra-row equality, mirroring
    plain patterns.

    ``sources`` (advanced, used by the semi-naive rule engine) supplies
    a per-required-pattern triples frame: pattern ``i`` scans
    ``sources[i]`` instead of ``triples``.  Optional/not-exists
    patterns always scan ``triples``.

    ``optional`` patterns follow SPARQL OPTIONAL semantics via left
    outer joins: required bindings survive with NULL for the optional
    pattern's new variables when it does not match.  Each optional
    pattern must share at least one variable with the preceding
    required/optional patterns (an unconnected OPTIONAL would be a
    cross product — rejected loudly instead of silently exploding).
    An entry may also be ``("__path__", steps, subj, obj)`` (a path
    relation left-joins like a pattern frame) or ``("__group__",
    {"patterns", "paths", "filters"})`` — a SPARQL §18.5 LeftJoin
    UNIT: the whole group evaluates as its own BGP plan (recursive
    match_bgp) and left-joins as one frame, so a partial match binds
    nothing; group filters are over group-local variables only.

    Semantics note, stated precisely (r7 — VERDICT r6 #4): sequential
    LEFT JOINs implement SPARQL's common case exactly (each OPTIONAL
    references variables bound by the required patterns).  When a
    later optional joins on a variable a PREVIOUS optional may have
    left NULL, ``unbound_compat=True`` (default) applies SPARQL's
    compatibility rule: the join condition for each possibly-unbound
    shared variable becomes ``v IS NULL OR v = candidate`` and the
    output takes ``coalesce(v, candidate)`` — an unbound variable is
    compatible with (and gets bound by) any value, per SPARQL 1.1
    §18.5 LeftJoin.  ``unbound_compat=False`` restores plain SQL NULL
    semantics (NULL keys never match).  Statically, compatibility
    conditions are emitted ONLY for shared variables introduced by an
    earlier OPTIONAL; variables bound by required patterns keep plain
    equi-join keys, so the common case still hash-joins — the
    OR-IS-NULL residual (and, when NO shared variable is
    required-bound, a broadcast nested-loop join over the optional's
    filtered scan) is paid only by queries that actually hit the
    nested-unbound corner."""
    if not patterns and not paths:
        raise ValueError("match_bgp requires at least one pattern")
    if sources is not None and len(sources) != len(patterns):
        raise ValueError(
            f"sources must have one frame per required pattern "
            f"({len(sources)} != {len(patterns)})")
    var_order: list[str] = []
    result: DataFrame | None = None

    def _join(result, frame):
        if result is None:
            return frame
        shared = [c for c in frame.columns
                  if c in result.columns and not c.startswith("_")]
        return (result.join(frame, on=shared) if shared
                else result.crossJoin(frame))

    for i, pat in enumerate(patterns):
        src = sources[i] if sources is not None else triples
        frame = _pattern_frame(src, pat, i, var_order)
        result = _join(result, frame)
    for k, (steps, s, o) in enumerate(paths or []):
        frame = _path_frame(triples, steps, s, o, k, var_order)
        result = _join(result, frame)
    if not var_order:
        raise ValueError("BGP has no variables — use a plain filter to "
                         "test ground triples")
    for expr, alias in binds or []:
        if alias in var_order:
            raise ValueError(
                f"BIND alias ?{alias} is already bound — SPARQL "
                "forbids rebinding (1.1 §10.1)")
        if alias.startswith("_"):
            raise ValueError(
                f"BIND alias ?{alias} may not start with '_' "
                "(reserved for internal columns)")
        result = result.withColumn(alias, F.expr(expr))
        var_order.append(alias)
    # SPARQL §18.5 scopes FILTERs to the whole group, AFTER the
    # OPTIONAL left joins — a filter over a variable an optional will
    # introduce (the `!BOUND(?x)` negation idiom, or any comparison
    # with SPARQL's error->false on unbound ≡ SQL NULL) defers past
    # the optional loop.  Filters split on their TOP-LEVEL AND
    # conjuncts first (safe: filtering on A AND B ≡ filtering on A
    # then B under three-valued logic), so in a mixed filter only the
    # optional-referencing conjuncts defer and the rest still push to
    # the pattern scans.
    import re as _re

    opt_vars: set[str] = set()
    for pat in optional or []:
        if pat and pat[0] == "__group__":
            g = pat[1]
            terms = [t for pp in g["patterns"] for t in pp] + \
                    [t for _s, s, o in g["paths"] for t in (s, o)]
        else:
            terms = list(pat)
        opt_vars.update(t[1:] for t in terms
                        if isinstance(t, str) and t.startswith("?")
                        and t[1:] not in var_order)
    deferred_filters: list[str] = []
    for expr in filters or []:
        for part in (_split_conjuncts(expr) if opt_vars else [expr]):
            if any(_re.search(rf"\b{_re.escape(v)}\b", part)
                   for v in opt_vars):
                deferred_filters.append(part)
            else:
                result = result.filter(F.expr(part))
    for how, label, pats in (("left_semi", "exists", exists or []),
                             ("left_anti", "not_exists",
                              not_exists or [])):
        for m, pat in enumerate(pats):
            guard_vars: list[str] = []
            if pat and pat[0] == "__path__":
                # property path guard (r8): the path relation's
                # endpoint columns semi/anti-join on the shared vars
                # exactly like a pattern guard (seeded tier when an
                # endpoint is ground; fresh endpoints existential)
                guard = _path_frame(triples, pat[1], pat[2], pat[3],
                                    2000 + m, guard_vars)
            else:
                guard = _pattern_frame(triples, pat, -(m + 1),
                                       guard_vars)
            # A guard variable an OPTIONAL will introduce LATER is a
            # silent-wrong-answer hazard: guards join before the
            # OPTIONAL left joins, so the variable would drop out of
            # the shared keys and be treated as existential ('?s <p> ?o
            # . OPTIONAL { ?s <q> ?y } FILTER NOT EXISTS { ?s <r> ?y }'
            # returned [] where SPARQL returns the non-matching rows).
            # Reject loudly, mirroring the only_late BIND check.
            hazard = sorted(
                {c for c in guard.columns if not c.startswith("_")}
                & (opt_vars - set(result.columns)))
            if hazard:
                raise ValueError(
                    f"{label.upper().replace('_', ' ')} pattern {m} "
                    f"references OPTIONAL-introduced variable(s) "
                    f"{hazard}: guards evaluate before OPTIONAL left "
                    "joins in this subset and would silently treat "
                    "them as existential — not supported")
            shared = [c for c in guard.columns
                      if c in result.columns and not c.startswith("_")]
            if not shared:
                raise ValueError(
                    f"{label} pattern {m} shares no variable with the "
                    f"required patterns (disconnected "
                    f"{label.upper().replace('_', ' ')})")
            result = result.join(guard.select(*shared).distinct(),
                                 on=shared, how=how)
    maybe_unbound: set[str] = set()
    for j, pat in enumerate(optional or []):
        if pat and pat[0] == "__group__":
            # OPTIONAL group UNIT (r8, SPARQL §18.5 LeftJoin): the
            # whole group evaluates as its own BGP plan — patterns,
            # paths, group-local FILTERs — and left-joins as one
            # frame, so a partial match binds NOTHING.  Group filters
            # must be over the group's own variables; one that names
            # an outer-only column would evaluate against the wrong
            # scope, so reject it loudly here.
            g = pat[1]
            g_vars = {t[1:] for pp in g["patterns"] for t in pp
                      if isinstance(t, str) and t.startswith("?")}
            g_vars.update(t[1:] for _st, s, o in g["paths"]
                          for t in (s, o) if t.startswith("?"))
            import re as _re2
            for f in g["filters"]:
                outer = [c for c in result.columns
                         if c not in g_vars and not c.startswith("_")
                         and _re2.search(rf"\b{_re2.escape(c)}\b", f)]
                if outer:
                    raise ValueError(
                        f"FILTER inside OPTIONAL references outer "
                        f"variable(s) {outer} — only group-local "
                        "variables are supported in this subset")
            frame = match_bgp(triples, g["patterns"],
                              paths=g["paths"] or None,
                              filters=g["filters"] or None)
            for c in frame.columns:
                if c not in var_order:
                    var_order.append(c)
        elif pat and pat[0] == "__path__":
            # property path inside OPTIONAL (r8): the path relation
            # left-joins like any optional pattern frame (seeded tier
            # when an endpoint is ground)
            _tag, steps, p_s, p_o = pat
            if not p_s.startswith("?") and not p_o.startswith("?"):
                raise ValueError(
                    "a fully-ground property path inside OPTIONAL is "
                    "outside this subset (it binds nothing — use a "
                    "required pattern or FILTER EXISTS)")
            frame = _path_frame(triples, steps, p_s, p_o,
                                1000 + j, var_order)
        else:
            frame = _pattern_frame(triples, pat, len(patterns) + j,
                                   var_order)
        fcols = [c for c in frame.columns if not c.startswith("_")]
        shared = [c for c in fcols if c in result.columns]
        if not shared:
            raise ValueError(
                f"optional pattern {j} shares no variable with the "
                "preceding patterns (unconnected OPTIONAL)")
        new_vars = [c for c in fcols if c not in result.columns]
        compat = [c for c in shared
                  if unbound_compat and c in maybe_unbound]
        if not compat:
            result = result.join(frame, on=shared, how="left")
        else:
            # SPARQL unbound-compatibility: rename the right side's
            # shared columns, join on equality for required-bound vars
            # plus IS-NULL-OR-EQUAL for possibly-unbound ones, then
            # coalesce the compat vars into the binding
            ren = {c: f"__opt{j}_{c}" for c in shared}
            f2 = frame.select(
                *[F.col(c).alias(ren.get(c, c)) for c in frame.columns])
            cond = None
            for c in shared:
                lc, rc = result[c], F.col(ren[c])
                e = (lc.isNull() | (lc == rc)) if c in compat \
                    else (lc == rc)
                cond = e if cond is None else (cond & e)
            result = result.join(f2, cond, "left")
            for c in compat:
                result = result.withColumn(
                    c, F.coalesce(F.col(c), F.col(ren[c])))
            result = result.drop(*ren.values())
        # vars introduced by this optional are NULL on its miss rows;
        # required-bound shared vars stay always-bound (left value
        # kept), compat vars remain possibly-unbound (NULL iff still
        # unmatched after coalesce)
        maybe_unbound.update(new_vars)
    for expr in deferred_filters:
        result = result.filter(F.expr(expr))
    out = result.select(*var_order)
    return out.distinct() if distinct else out


def match_union(triples: DataFrame,
                groups: list[list[tuple[str, str, str]]],
                distinct: bool = True) -> DataFrame:
    """SPARQL UNION of BGP groups: each group matches independently,
    results are unioned over the UNION of the groups' variables
    (first-appearance order across groups) with NULL for variables a
    group does not bind — SPARQL's unbound-variable semantics.

    A branch may mix plain patterns with ``("__path__", steps, subj,
    obj)`` property-path entries (r8) — each branch routes them to its
    match_bgp plan's ``paths=``.

    Plan shape: one match_bgp plan per group (each with its own
    pushed-down scans and join order) plus a zero-shuffle unionByName;
    the optional final distinct is the only added exchange."""
    if not groups:
        raise ValueError("match_union requires at least one group")
    frames = []
    for pats in groups:
        plain = [p for p in pats if not (p and p[0] == "__path__")]
        paths = [(p[1], p[2], p[3]) for p in pats
                 if p and p[0] == "__path__"]
        frames.append(match_bgp(triples, plain, distinct=False,
                                paths=paths or None))
    var_order: list[str] = []
    for fr in frames:
        for c in fr.columns:
            if c not in var_order:
                var_order.append(c)
    padded = [fr.select(*[
        F.col(v) if v in fr.columns
        else F.lit(None).cast("string").alias(v)
        for v in var_order]) for fr in frames]
    out = padded[0]
    for fr in padded[1:]:
        out = out.unionByName(fr)
    return out.distinct() if distinct else out


_PATH_MODS = ("one", "plus", "star", "opt")


def _graph_terms(triples: DataFrame) -> DataFrame:
    """All terms of the graph (subjects ∪ objects), the SPARQL domain
    of zero-length paths."""
    return (triples.select(F.col("subj").alias("node"))
            .unionByName(triples.select(F.col("obj").alias("node")))
            .distinct())


def _step_edges(triples: DataFrame, alts: list[str], i: int) -> DataFrame:
    """One path step's distinct (src, dst) edge frame: pred-pushed
    scan; alternates = one IN filter; ``^p`` inverts that alternate;
    all-``!`` alternates form a negated property set (forward)."""
    neg = [p[1:] for p in alts if p.startswith("!")]
    if neg:
        # negated property set !(p1|p2): any edge whose predicate
        # is NOT in the set, forward direction (SPARQL 1.1 §9.1)
        if len(neg) != len(alts):
            raise ValueError(
                f"step {i}: cannot mix negated (!p) and plain "
                "alternates in one property set")
        return (triples.filter(~F.col("pred").isin(neg))
                .select(F.col("subj").alias("src"),
                        F.col("obj").alias("dst"))
                .distinct())
    fwd = [p for p in alts if not p.startswith("^")]
    inv = [p[1:] for p in alts if p.startswith("^")]
    frames = []
    if fwd:
        frames.append(
            triples.filter(F.col("pred").isin(fwd))
            .select(F.col("subj").alias("src"),
                    F.col("obj").alias("dst")))
    if inv:
        frames.append(
            triples.filter(F.col("pred").isin(inv))
            .select(F.col("obj").alias("src"),
                    F.col("subj").alias("dst")))
    edges = frames[0]
    for fr in frames[1:]:
        edges = edges.unionByName(fr)
    return edges.distinct()


def _is_group(preds) -> bool:
    """A GROUP step's preds is a nested list of steps — ``(p/q)+``
    parses to ``([(p, 'one'), (q, 'one')], 'plus')`` — versus an
    alternation, which is a list of predicate strings."""
    return (isinstance(preds, (list, tuple)) and bool(preds)
            and isinstance(preds[0], tuple))


def _is_alt_groups(preds) -> bool:
    """An ALTERNATION-OF-GROUPS step's preds (r8, ``(p/q)|r``) is a
    list of ALTERNATIVES, each itself a steps-list — evaluated as the
    union of the alternatives' sub-relations."""
    return (isinstance(preds, (list, tuple)) and bool(preds)
            and isinstance(preds[0], list))


def _validate_step(step, i: int):
    """Shared step validation -> (preds, mod)."""
    if len(step) != 2:
        raise ValueError(f"step {i} must be (preds, mod): {step!r}")
    preds, mod = step
    if mod not in _PATH_MODS:
        raise ValueError(f"step {i}: unknown modifier {mod!r} "
                         f"(expected one of {_PATH_MODS})")
    if not isinstance(preds, str) and not preds:
        raise ValueError(f"step {i}: empty alternation")
    return preds, mod


def _bfs_fix(frontier: DataFrame, step_fn, max_layers: int) -> DataFrame:
    """Nodes with a path of >= 1 applications of ``step_fn`` from
    ``frontier`` — plain BFS, one anti-join + localCheckpoint per
    layer (k_hop's layer machinery).  Rounds = eccentricity of the
    frontier, but each round touches only the frontier's out-edges —
    never the whole relation's closure.  ``step_fn`` maps a ``node``
    frame to the nodes one step away (an edge join for atom steps, a
    recursive sub-path evaluation for group steps).  ``max_layers``
    is the LINEAR layer budget (``2**(max_iters-1)`` from the caller's
    doubling-tier ``max_iters`` — same covered diameter)."""
    reached: DataFrame | None = None
    layer = frontier
    for _ in range(max_layers):
        nxt = step_fn(layer).distinct()
        if reached is not None:
            nxt = nxt.join(reached, on="node", how="left_anti")
        nxt = nxt.localCheckpoint()
        if nxt.isEmpty():
            break
        reached = (nxt if reached is None
                   else reached.unionByName(nxt).localCheckpoint())
        layer = nxt
    else:
        raise RuntimeError(
            f"seeded path expansion did not converge in {max_layers} "
            "layers (diameter bound; raise max_iters)")
    if reached is None:
        return frontier.limit(0)
    return reached


def _seeded_eval(triples: DataFrame, steps: list[tuple],
                 frontier: DataFrame, reverse: bool,
                 max_layers: int) -> DataFrame:
    """Frontier evaluation of a path over a ``node`` frame of current
    positions.  ``reverse=True`` evaluates right-to-left (ground
    OBJECT): steps in reverse order with each leaf step's edge frame
    direction swapped — exactly the inverse path (applied recursively
    to nested groups)."""
    ordered = list(reversed(steps)) if reverse else list(steps)
    for i, step in enumerate(ordered):
        preds, mod = _validate_step(step, i)
        if _is_alt_groups(preds):
            # alternation of sub-paths: one frontier application is
            # the UNION of applying each alternative (r8)
            alts_steps = [list(a) for a in preds]

            def step_fn(fr, _alts=alts_steps):
                out = None
                for sub in _alts:
                    nxt = _seeded_eval(triples, sub, fr, reverse,
                                       max_layers)
                    out = nxt if out is None else out.unionByName(nxt)
                return out.distinct()
        elif _is_group(preds):
            sub = list(preds)

            def step_fn(fr, _sub=sub):
                return _seeded_eval(triples, _sub, fr, reverse,
                                    max_layers)
        else:
            alts = [preds] if isinstance(preds, str) else list(preds)
            edges = _step_edges(triples, alts, i)
            if reverse:
                edges = edges.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst"))
            edges = edges.localCheckpoint()

            def step_fn(fr, _e=edges):
                return (fr.join(_e, fr.node == _e.src)
                        .select(F.col("dst").alias("node")))
        if mod == "one":
            frontier = step_fn(frontier).distinct().localCheckpoint()
        elif mod == "opt":
            frontier = (step_fn(frontier)
                        .unionByName(frontier)
                        .distinct().localCheckpoint())
        elif mod == "plus":
            frontier = _bfs_fix(frontier, step_fn, max_layers)
        else:  # star
            frontier = (_bfs_fix(frontier, step_fn, max_layers)
                        .unionByName(frontier)
                        .distinct().localCheckpoint())
    return frontier


def _seeded_path_nodes(triples: DataFrame, steps: list[tuple],
                       seed: str, reverse: bool,
                       max_iters: int) -> DataFrame:
    """Seeded tier entry: final positions of the path from one ground
    endpoint.  The initial frontier is the seed INTERSECTED with the
    graph terms, which preserves exact equivalence with the
    unconstrained tier (whose zero-length identity ranges over graph
    terms only): a seed that is not a graph term has no edges and no
    zero-path identity, so every result is empty either way.

    Depth parity (ADVICE r7): the unconstrained tier's doubling
    closure covers diameter ``2**(max_iters-1)`` while the seeded
    tier's BFS is LINEAR in layers — so the same ``max_iters`` is
    converted to that layer budget here, and adding a ground endpoint
    can never make a query fail that succeeded unseeded.  The budget
    is only a runaway guard: BFS over a finite graph terminates within
    the node count regardless."""
    frontier = (_graph_terms(triples)
                .filter(F.col("node") == F.lit(seed))
                .localCheckpoint())
    return _seeded_eval(triples, steps, frontier, reverse,
                        1 << (max_iters - 1))


def _bidi_pair(triples: DataFrame, steps: list[tuple], src: str,
               dst: str, max_iters: int) -> DataFrame:
    """BOTH endpoints ground (r8, VERDICT r7 #6): is (src, dst) in the
    path relation?  Returns the one-row (src, dst) frame if connected,
    else empty — exactly the seeded tier's filtered answer, but never
    materializing the full forward reach:

    * a single closure step (``p+``/``p*``, the common form) runs
      MEET-IN-THE-MIDDLE alternating BFS: expand whichever side's
      frontier is currently smaller (forward from src / backward from
      dst), stop as soon as a new layer intersects the other side's
      accumulated reach — work is bounded by the smaller side's
      expansion instead of src's full eccentricity, and the depth>=1
      requirement of ``plus`` holds by construction (a check only
      fires on a layer at depth>=1 on one side);
    * a multi-step sequence splits at the midpoint: the prefix
      evaluates forward from src, the suffix backward from dst, and
      the path connects iff the midpoint position sets intersect
      (dst is reachable iff some prefix-position reaches it via the
      suffix — one equi-join instead of carrying the whole frontier
      through the full sequence);
    * a single non-closure step just applies it once from src.

    Equivalence with ``seeded-then-filter`` is property-tested
    (tests/test_bgp.py)."""
    max_layers = 1 << (max_iters - 1)
    empty = (triples.limit(0)
             .select(F.lit(src).alias("src"), F.lit(dst).alias("dst")))

    def pair(hit: DataFrame) -> DataFrame:
        return hit.limit(1).select(F.lit(src).alias("src"),
                                   F.lit(dst).alias("dst"))

    terms = _graph_terms(triples)
    f_src = (terms.filter(F.col("node") == F.lit(src))
             .localCheckpoint())
    f_dst = (terms.filter(F.col("node") == F.lit(dst))
             .localCheckpoint())
    if len(steps) > 1:
        k = len(steps) // 2
        a = _seeded_eval(triples, list(steps[:k]), f_src, False,
                         max_layers)
        b = _seeded_eval(triples, list(steps[k:]), f_dst, True,
                         max_layers)
        return pair(a.join(b, "node"))
    preds, mod = _validate_step(steps[0], 0)
    if mod not in ("plus", "star"):
        nodes = _seeded_eval(triples, steps, f_src, False, max_layers)
        return pair(nodes.filter(F.col("node") == F.lit(dst)))
    if mod == "star" and src == dst:
        # zero-length identity: connected iff src is a graph term
        return pair(f_src)

    def one_step(fr: DataFrame, reverse: bool) -> DataFrame:
        return _seeded_eval(triples, [(preds, "one")], fr, reverse,
                            max_layers)

    fwd_all, bwd_all = f_src, f_dst
    fwd_frontier, bwd_frontier = f_src, f_dst
    n_f, n_b = fwd_frontier.count(), bwd_frontier.count()
    if n_f == 0 or n_b == 0:
        return empty
    for _ in range(2 * max_layers):
        if n_f == 0 and n_b == 0:
            # both reaches complete, no intersection ever fired
            return empty
        expand_fwd = n_b == 0 or (n_f != 0 and n_f <= n_b)
        if expand_fwd:
            # check the FULL one-step reach (depth >= 1) against the
            # other side BEFORE pruning visited nodes — a revisited
            # node (e.g. the seed itself, closing a cycle) is a valid
            # witness even though it is not frontier-new
            reached = one_step(fwd_frontier, False).localCheckpoint()
            if not reached.join(bwd_all, on="node").isEmpty():
                return pair(f_src)
            new = (reached.join(fwd_all, on="node", how="left_anti")
                   .localCheckpoint())
            n_f = new.count()
            if n_f:
                fwd_all = fwd_all.unionByName(new).localCheckpoint()
                fwd_frontier = new
        else:
            reached = one_step(bwd_frontier, True).localCheckpoint()
            if not reached.join(fwd_all, on="node").isEmpty():
                return pair(f_src)
            new = (reached.join(bwd_all, on="node", how="left_anti")
                   .localCheckpoint())
            n_b = new.count()
            if n_b:
                bwd_all = bwd_all.unionByName(new).localCheckpoint()
                bwd_frontier = new
    raise RuntimeError(
        f"bidirectional path search did not converge in "
        f"{2 * max_layers} layers (diameter bound; raise max_iters)")


def match_path(triples: DataFrame,
               steps: list[tuple],
               max_iters: int = 20,
               src: str | None = None,
               dst: str | None = None) -> DataFrame:
    """SPARQL 1.1 property-path evaluation over the triples table,
    returning the distinct (src, dst) pairs the path connects.

    ``steps`` is the parsed path: a SEQUENCE (``p1/p2``) of steps, each
    ``(preds, mod)`` where ``preds`` is one predicate IRI or a list of
    ALTERNATES (``p1|p2``) — a leading ``^`` on a predicate inverts
    that alternate (``^p``), and a leading ``!`` on EVERY alternate
    makes the step a NEGATED property set (``!(p1|p2)``: any edge via
    a predicate not in the set, forward direction, SPARQL 1.1 §9.1) —
    and ``mod`` is ``"one"``, ``"plus"`` (``p+``), ``"star"``
    (``p*``) or ``"opt"`` (``p?``).  ``preds`` may also be a nested
    list of steps — a parenthesised GROUP, ``(p/q)+`` =
    ``([(p, 'one'), (q, 'one')], 'plus')`` — evaluated as the closure
    (or option) of the composed sub-relation; groups nest.  A list of
    LISTS is an ALTERNATION OF SUB-PATHS (r8, ``(p/q)|r`` =
    ``([[([(p,'one'),(q,'one')], 'one')], [('r','one')]], 'one')``):
    the union of the alternatives' relations, each alternative a full
    steps-list carrying its own modifiers.

    Spark-first compilation: each step is a pred-pushed-down scan
    (alternates become one IN filter, inverses a column swap) reduced
    to a distinct (src, dst) edge frame; ``plus`` runs the
    log2(diameter)-round doubling closure (``graph.transitive_closure``);
    ``star``/``opt`` union the zero-length identity over ALL graph
    terms (the SPARQL zero-path domain — subjects ∪ objects);
    sequences are equi-joins step.dst == next.src, ordered by
    Catalyst/AQE.  Deterministic, fully distributed, no driver rows.

    ``src`` / ``dst`` (ground endpoints — r6 VERDICT #2): when the
    query binds an endpoint to a constant (CLI ``<c> p+ ?x`` /
    ``?s p+ <c>``), the scale-right plan is NOT "close the whole
    relation, then filter": closure output is quadratic in component
    size while the seeded answer is one node set.  With ``src`` set,
    evaluation switches to frontier expansion from the constant
    (k_hop's layer machinery — one join per BFS layer, cost tracks the
    frontier's out-edges); with only ``dst`` set, the path is
    evaluated right-to-left over direction-swapped edges; with BOTH
    set, the result is the (src, dst) pair if connected, else empty —
    evaluated MEET-IN-THE-MIDDLE (r8, ``_bidi_pair``): alternating
    smaller-frontier-first bidirectional BFS for a single closure
    step, midpoint split for sequences, so work is bounded by the
    smaller side's reach instead of src's full eccentricity.
    Exact-equivalence with the unconstrained tier is property-tested
    (including the zero-length-identity graph-terms domain)."""
    if not steps:
        raise ValueError("match_path requires at least one step")
    if src is not None and dst is not None:
        return _bidi_pair(triples, steps, src, dst, max_iters)
    if src is not None:
        nodes = _seeded_path_nodes(triples, steps, src, False, max_iters)
        return nodes.select(F.lit(src).alias("src"),
                            F.col("node").alias("dst"))
    if dst is not None:
        nodes = _seeded_path_nodes(triples, steps, dst, True, max_iters)
        return nodes.select(F.col("node").alias("src"),
                            F.lit(dst).alias("dst"))
    return _path_relation(triples, steps, max_iters, [None])


def _path_relation(triples: DataFrame, steps: list[tuple],
                   max_iters: int, ident: list) -> DataFrame:
    """Unconstrained tier: the full (src, dst) relation of a step
    sequence.  Group steps recurse (closure over the composed
    sub-relation); ``ident`` is a one-slot holder so the zero-length
    identity frame is computed once across the whole (nested) path."""
    from .graph import transitive_closure

    result: DataFrame | None = None
    for i, step in enumerate(steps):
        preds, mod = _validate_step(step, i)
        if _is_alt_groups(preds):
            # union of the alternatives' sub-relations (r8): each
            # alternative is a full steps-list with its own mods
            edges = None
            for alt in preds:
                rel = _path_relation(triples, list(alt), max_iters,
                                     ident)
                edges = rel if edges is None else edges.unionByName(rel)
            edges = edges.distinct()
        elif _is_group(preds):
            edges = _path_relation(triples, list(preds), max_iters,
                                   ident)
        else:
            alts = [preds] if isinstance(preds, str) else list(preds)
            edges = _step_edges(triples, alts, i)
        if mod == "plus":
            edges = transitive_closure(edges, max_iters=max_iters)
        elif mod in ("star", "opt"):
            if mod == "star":
                edges = transitive_closure(edges, max_iters=max_iters)
            if ident[0] is None:
                ident[0] = (_graph_terms(triples)
                            .select(F.col("node").alias("src"),
                                    F.col("node").alias("dst"))
                            .localCheckpoint())
            edges = edges.unionByName(ident[0]).distinct()
        if result is None:
            result = edges
        else:
            nxt = (edges.withColumnRenamed("src", "_mid")
                   .withColumnRenamed("dst", "_nxt"))
            result = (result.join(nxt,
                                  result.dst == F.col("_mid"))
                      .select("src", F.col("_nxt").alias("dst"))
                      .distinct())
    return result
