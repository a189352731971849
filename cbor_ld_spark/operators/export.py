"""N-Triples / N-Quads serialization of the triples table.

The RDF interop edge: the reference ecosystem exchanges expanded
JSON-LD as N-Triples/N-Quads (W3C N-Triples spec — public), so the
materialized graph needs a writer whose lines any RDF store can load.
Spark-first: the whole formatter is Column algebra (concat/replace/
when) in whole-stage codegen — no UDF, no driver pass; the writer is
an ordinary ``df.write.text``.

Formatting rules implemented (N-Triples canonical-ish):
* IRIs as ``<iri>``; blank nodes (``_:...``) pass through verbatim;
* literals quoted with backslash escapes for ``\\ " \\n \\r \\t``;
* ``@lang`` when a language tag is present, else ``^^<datatype>`` for
  non-xsd:string datatypes (plain xsd:string stays bare, per spec);
* N-Quads mode appends the graph term when the row's graph is not the
  default graph (empty string).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

_LITERAL_ESCAPES = (("\\", "\\\\"), ('"', '\\"'),
                    ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t"))


def _escape_literal(col: Column) -> Column:
    for raw, esc in _LITERAL_ESCAPES:
        col = F.replace(col, F.lit(raw), F.lit(esc))
    return col


def _term(col: Column) -> Column:
    """IRI or blank-node term."""
    return (F.when(col.startswith("_:"), col)
            .otherwise(F.concat(F.lit("<"), col, F.lit(">"))))


def escape_literal_py(s: str) -> str:
    """Driver-side mirror of ``_escape_literal`` (oracle replay)."""
    for raw, esc in _LITERAL_ESCAPES:
        s = s.replace(raw, esc)
    return s


def format_quad_py(subj: str, pred: str, obj: str, is_iri: bool,
                   dt: str | None, lang: str | None,
                   graph: str, quads: bool = True) -> str:
    """Driver-side mirror of the Column formatter (oracle replay)."""
    def term(t: str) -> str:
        return t if t.startswith("_:") else f"<{t}>"

    if is_iri:
        o = term(obj)
    else:
        o = f'"{escape_literal_py(obj)}"'
        if lang is not None:
            o += f"@{lang}"
        elif dt is not None and dt != XSD_STRING:
            o += f"^^<{dt}>"
    line = f"{term(subj)} {pred if pred.startswith('_:') else f'<{pred}>'} {o}"
    if quads and graph:
        line += f" {term(graph)}"
    return line + " ."


def to_ntriples(triples: DataFrame, distinct: bool = True,
                quads: bool = False) -> DataFrame:
    """One ``line`` column per triple (or quad); ``distinct=True``
    gives RDF set semantics over the corpus-level graph."""
    obj_suffix = (
        F.when(F.col("obj_lang").isNotNull(),
               F.concat(F.lit("@"), F.col("obj_lang")))
        .when(F.col("obj_datatype").isNotNull()
              & (F.col("obj_datatype") != XSD_STRING),
              F.concat(F.lit("^^<"), F.col("obj_datatype"), F.lit(">")))
        .otherwise(F.lit("")))
    obj_term = (
        F.when(F.col("obj_is_iri"), _term(F.col("obj")))
        .otherwise(F.concat(F.lit('"'), _escape_literal(F.col("obj")),
                            F.lit('"'), obj_suffix)))
    parts = [_term(F.col("subj")), F.lit(" "),
             _term(F.col("pred")), F.lit(" "), obj_term]
    if quads:
        parts += [F.when((F.col("graph").isNotNull())
                         & (F.col("graph") != ""),
                         F.concat(F.lit(" "), _term(F.col("graph"))))
                  .otherwise(F.lit(""))]
    parts += [F.lit(" .")]
    out = triples.select(F.concat(*parts).alias("line"))
    return out.distinct() if distinct else out
