"""Rule-based inference: CONSTRUCT templates + forward chaining.

The KG-enrichment primitive (SPARQL CONSTRUCT / datalog-style rules —
public semantics): a rule is ``where`` (a BGP, see ``operators/bgp``)
plus a ``template`` of triple patterns instantiated once per binding.
``forward_chain`` applies a rule set to fixpoint — derived triples feed
later rounds, so rules can build on each other — which is how RDFS-ish
materialization (subclass closure, derived relations) ships WITH the
graph instead of being recomputed by every consumer.

Scale shape: each round is |rules| BGP matches (filtered scans +
equi-joins that Catalyst/AQE order and broadcast — see the BGP plan
audit in BENCH.md) plus one ``left_anti`` against the accumulated
triple set to keep only NEW derivations; the accumulator is
localCheckpoint'd per round (iterative-plan lineage rule).  Rounds are
bounded by ``max_rounds`` with a loud failure — a production deployment
materializes the fixpoint once per corpus snapshot.  The naive
re-evaluation per round is the shallow-fixpoint formulation;
``semi_naive=True`` evaluates each rule against the previous round's
delta (k variants per k-pattern rule) so per-round cost tracks |Δ|
instead of |all facts| — the 10^12 path when rule chains are deep.

Determinism: rounds and results are pure functions of (triples, rules)
— set semantics throughout — so the driver oracle replays the identical
fixpoint in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .bgp import match_bgp

TRIPLE_COLS = ("subj", "pred", "obj")


def instantiate_template(binds: DataFrame,
                         template: list[tuple[str, str, str]]
                         ) -> DataFrame:
    """Instantiate a CONSTRUCT ``template`` once per row of a bindings
    frame (one column per variable): ``?var`` terms read the column,
    everything else is a constant; rows where any template variable is
    NULL (possible via OPTIONAL) are dropped, per CONSTRUCT semantics.
    Shared by the programmatic ``construct`` and the SPARQL-text
    CONSTRUCT form (operators/sparql.py, r8)."""
    if not template:
        raise ValueError("construct requires at least one template "
                         "pattern")

    def term_col(term: str, alias: str):
        if term.startswith("?"):
            var = term[1:]
            if var not in binds.columns:
                raise ValueError(
                    f"template variable ?{var} is not bound by the "
                    "where clause")
            return F.col(var).alias(alias)
        return F.lit(term).alias(alias)

    frames = []
    for pat in template:
        if len(pat) != 3:
            raise ValueError(f"template pattern must be a triple: {pat!r}")
        frame = binds.select(*[term_col(t, a)
                               for t, a in zip(pat, TRIPLE_COLS)])
        frames.append(frame.filter(
            F.col("subj").isNotNull() & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.distinct()


def construct(triples: DataFrame,
              where: list[tuple[str, str, str]],
              template: list[tuple[str, str, str]],
              optional: list[tuple[str, str, str]] | None = None,
              sources: list[DataFrame] | None = None) -> DataFrame:
    """One CONSTRUCT application: (subj, pred, obj) rows instantiated
    from the template for every (distinct) BGP binding.  Template
    variables must be bound by the where clause; rows where any
    template variable is NULL (possible via OPTIONAL) are dropped, per
    CONSTRUCT semantics."""
    if not template:
        raise ValueError("construct requires at least one template "
                         "pattern")
    binds = match_bgp(triples, where, optional=optional, distinct=True,
                      sources=sources)
    return instantiate_template(binds, template)


def forward_chain(triples: DataFrame,
                  rules: list[tuple[list, list]],
                  max_rounds: int = 10,
                  semi_naive: bool = False) -> DataFrame:
    """Apply ``rules`` (list of (where, template) pairs) to fixpoint
    over the (subj, pred, obj) projection of ``triples``; returns the
    DERIVED triples only (distinct, never re-asserting base facts).

    Each round: evaluate every rule against base ∪ derived-so-far, keep
    templates instantiations not already present (left_anti), stop when
    a round derives nothing.  Raises after ``max_rounds`` (loud bound,
    never a silently-truncated closure) — a fixpoint deeper than the
    default needs a higher ``max_rounds``, and ``semi_naive=True`` to
    keep those extra rounds affordable.

    ``semi_naive=True`` is the deep-fixpoint/100-TB tier (classic
    datalog delta evaluation): round r evaluates each k-pattern rule as
    k variants, variant i binding pattern i to Δ (the facts first
    derived in round r-1) and every other pattern to the full
    accumulator.  Any NEW derivation must use at least one Δ fact, so
    the union of variants is complete; distinct + the anti-join against
    the accumulator removes the overlap between variants.  Per-round
    cost is driven by |Δ| (shrinking) instead of |all facts| (growing)
    — on a depth-d chain the naive tier re-derives every earlier round's
    output d times, the semi-naive tier derives each fact once.
    Results are identical; the equivalence is property-tested."""
    if not rules:
        raise ValueError("forward_chain requires at least one rule")
    base = triples.select(*TRIPLE_COLS).distinct().localCheckpoint()
    all_facts = base
    delta = base
    derived: DataFrame | None = None
    for _ in range(max_rounds):
        if semi_naive:
            new_frames = [
                construct(all_facts, where, template,
                          sources=[delta if j == i else all_facts
                                   for j in range(len(where))])
                for where, template in rules
                for i in range(len(where))]
        else:
            new_frames = [construct(all_facts, where, template)
                          for where, template in rules]
        new = new_frames[0]
        for f in new_frames[1:]:
            new = new.unionByName(f)
        new = (new.distinct()
               .join(all_facts, list(TRIPLE_COLS), "left_anti")
               .localCheckpoint())
        if new.limit(1).count() == 0:
            return (derived if derived is not None
                    else new)  # empty frame with the right schema
        derived = (new if derived is None
                   else derived.unionByName(new).localCheckpoint())
        all_facts = all_facts.unionByName(new).localCheckpoint()
        delta = new
    raise RuntimeError(
        f"forward_chain did not reach fixpoint in {max_rounds} rounds")
