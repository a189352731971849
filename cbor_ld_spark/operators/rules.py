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
re-evaluation per round is the gate-scale formulation; the semi-naive
refinement (join each rule against the delta only) drops in without
changing results and is the 10^12 path when rule chains are deep.

Determinism: rounds and results are pure functions of (triples, rules)
— set semantics throughout — so the driver oracle replays the identical
fixpoint in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .bgp import match_bgp

TRIPLE_COLS = ("subj", "pred", "obj")


def construct(triples: DataFrame,
              where: list[tuple[str, str, str]],
              template: list[tuple[str, str, str]],
              optional: list[tuple[str, str, str]] | None = None
              ) -> DataFrame:
    """One CONSTRUCT application: (subj, pred, obj) rows instantiated
    from the template for every (distinct) BGP binding.  Template
    variables must be bound by the where clause; rows where any
    template variable is NULL (possible via OPTIONAL) are dropped, per
    CONSTRUCT semantics."""
    if not template:
        raise ValueError("construct requires at least one template "
                         "pattern")
    binds = match_bgp(triples, where, optional=optional, distinct=True)

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


def forward_chain(triples: DataFrame,
                  rules: list[tuple[list, list]],
                  max_rounds: int = 10) -> DataFrame:
    """Apply ``rules`` (list of (where, template) pairs) to fixpoint
    over the (subj, pred, obj) projection of ``triples``; returns the
    DERIVED triples only (distinct, never re-asserting base facts).

    Each round: evaluate every rule against base ∪ derived-so-far, keep
    templates instantiations not already present (left_anti), stop when
    a round derives nothing.  Raises after ``max_rounds`` — rule sets
    whose fixpoint is deeper than that need the semi-naive tier, not a
    silently-truncated closure."""
    if not rules:
        raise ValueError("forward_chain requires at least one rule")
    base = triples.select(*TRIPLE_COLS).distinct().localCheckpoint()
    all_facts = base
    derived: DataFrame | None = None
    for _ in range(max_rounds):
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
    raise RuntimeError(
        f"forward_chain did not reach fixpoint in {max_rounds} rounds")
