"""URDNA2015-style deterministic blank-node canonicalization.

Blank node labels minted during expansion are document-scoped
(``_:{doc_sha}_bN``); after entity linking, each connected component gets
canonical labels that are a pure function of the component's *structure*,
not of document order, row order, or partitioning — so two documents with
isomorphic graphs canonicalize identically.

Algorithm (simplified URDNA2015 / Hogan-style iterative colour
refinement, adequate for credential graphs which have no automorphic
blank-node orbits):

1. initial colour of a bnode = hash of its ground (non-bnode) edge
   signature,
2. iterate: colour' = hash(sorted multiset of (direction, pred,
   neighbor colour) + own colour) until stable or k rounds,
3. canonical label = ``_:c{rank}`` by final colour order (ties broken by
   the sorted full signature — deterministic).

Distribution: components are processed independently with
``applyInPandas`` grouped by component.  Components are small (a
credential graph is 5-50 nodes); the group-by key is the component id,
so skew only appears if one component is huge — the pipeline caps
per-component work and falls back to prefixed doc-scoped labels beyond
``max_component_triples`` (graceful degradation, recorded in metrics).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
)

CANON_SCHEMA = StructType([
    StructField("component", StringType(), False),
    StructField("node", StringType(), False),
    StructField("canon", StringType(), False),
])

MAX_COMPONENT_TRIPLES = 100_000


def _canonical_labels_for_component(
    triples: list[tuple[str, str, str, bool]],
) -> dict[str, str]:
    """triples: (subj, pred, obj, obj_is_iri) within one component."""
    bnodes = {t[0] for t in triples if t[0].startswith("_:")}
    bnodes |= {t[2] for t in triples if t[3] and t[2].startswith("_:")}
    if not bnodes:
        return {}

    def h(s: str) -> str:
        return hashlib.sha256(s.encode("utf-8")).hexdigest()

    # adjacency with ground terms inline
    out_edges: dict[str, list[tuple[str, str, bool]]] = {b: [] for b in bnodes}
    in_edges: dict[str, list[tuple[str, str, bool]]] = {b: [] for b in bnodes}
    for s, p, o, is_iri in triples:
        s_b, o_b = s in bnodes, (is_iri and o in bnodes)
        if s_b:
            out_edges[s].append((p, o if not o_b else "*", o_b))
        if o_b:
            in_edges[o].append((p, s if not s_b else "*", s_b))

    colour = {
        b: h("init|" + "|".join(sorted(
            [f"o:{p}:{o}:{int(ob)}" for p, o, ob in out_edges[b]] +
            [f"i:{p}:{s}:{int(sb)}" for p, s, sb in in_edges[b]]
        )))
        for b in bnodes
    }

    # colour refinement with neighbor colours
    nbr_out: dict[str, list[tuple[str, str]]] = {b: [] for b in bnodes}
    nbr_in: dict[str, list[tuple[str, str]]] = {b: [] for b in bnodes}
    for s, p, o, is_iri in triples:
        if s in bnodes and is_iri and o in bnodes:
            nbr_out[s].append((p, o))
            nbr_in[o].append((p, s))

    for _ in range(len(bnodes)):
        new = {}
        for b in bnodes:
            sig = [colour[b]]
            sig += sorted(f"o:{p}:{colour[o]}" for p, o in nbr_out[b])
            sig += sorted(f"i:{p}:{colour[s]}" for p, s in nbr_in[b])
            new[b] = h("|".join(sig))
        if new == colour:
            break
        if len(set(new.values())) == len(set(colour.values())) and \
                len(set(new.values())) == len(bnodes):
            colour = new
            break
        colour = new

    order = sorted(bnodes, key=lambda b: (colour[b], b))
    return {b: f"_:c{i}" for i, b in enumerate(order)}


def canonicalize_components(triples_with_component: DataFrame) -> DataFrame:
    """(component, subj, pred, obj, obj_is_iri) -> (component, node, canon)."""

    def fn(key, pdf):
        comp = key[0]
        if len(pdf) > MAX_COMPONENT_TRIPLES:
            # graceful degradation: keep doc-scoped labels, prefixed
            bn = set(pdf.loc[pdf["subj"].str.startswith("_:"), "subj"])
            bn |= set(pdf.loc[pdf["obj_is_iri"] &
                              pdf["obj"].str.startswith("_:"), "obj"])
            rows = [(comp, b, b) for b in sorted(bn)]
            return pd.DataFrame(rows, columns=["component", "node", "canon"])
        tl = list(zip(pdf["subj"], pdf["pred"], pdf["obj"], pdf["obj_is_iri"]))
        mapping = _canonical_labels_for_component(tl)
        rows = [(comp, node, canon) for node, canon in mapping.items()]
        return pd.DataFrame(rows, columns=["component", "node", "canon"])

    return (
        triples_with_component
        .groupBy("component")
        .applyInPandas(fn, schema=CANON_SCHEMA)
    )


def canonical_triples(triples: DataFrame, components: DataFrame) -> DataFrame:
    """Rewrite triple subject/object blank nodes to canonical labels.

    Canonical node id = ``{component}#{canon}`` for blank nodes (unique
    corpus-wide because the component id is the min IRI/bnode of the
    component), IRIs stay themselves.  Joins are plain equi-joins on the
    node id; the components frame is usually much smaller than triples
    (only bnodes) -> broadcastable at moderate scale, shuffle-join with
    AQE beyond.
    """
    comp_subj = components.select(
        F.col("id").alias("subj"), F.col("component").alias("subj_component"))

    with_comp = (
        triples.join(comp_subj, "subj", "left")
        .withColumnRenamed("subj_component", "component")
    )
    bnode_map = canonicalize_components(
        with_comp.select("component", "subj", "pred", "obj", "obj_is_iri")
        .filter(F.col("component").isNotNull())
    )

    canon_id = F.concat(F.col("component"), F.lit("#"), F.col("canon"))
    subj_map = bnode_map.select(F.col("node").alias("subj"),
                                canon_id.alias("subj_canon"))
    obj_map = bnode_map.select(F.col("node").alias("obj"),
                               canon_id.alias("obj_canon"))
    graph_map = bnode_map.select(F.col("node").alias("graph"),
                                 canon_id.alias("graph_canon"))

    out = (
        with_comp
        .join(subj_map, "subj", "left")
        .join(obj_map, "obj", "left")
        .join(graph_map, "graph", "left")
        .select(
            F.coalesce("subj_canon", F.col("subj")).alias("subj"),
            "pred",
            F.when(F.col("obj_is_iri"),
                   F.coalesce("obj_canon", F.col("obj")))
            .otherwise(F.col("obj")).alias("obj"),
            "obj_is_iri", "obj_datatype", "obj_lang",
            F.coalesce("graph_canon", F.col("graph")).alias("graph"),
            "repo", "path", "doc_sha", "component",
        )
    )
    return out
