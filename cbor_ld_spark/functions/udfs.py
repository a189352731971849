"""Arrow-batched kernel UDFs (the only Python in the hot path).

Design for 100 TB:

* ``jsonld_sniff`` is a pure-Column predicate — it runs JVM-side inside
  WholeStageCodegen *before* any Python, so non-candidate bytes (most of
  a source-code corpus) never cross the JVM<->Python boundary and the
  filter pushes into the scan.
* ``kg_process_batches`` is a single ``mapInArrow`` pass doing
  parse -> encode -> decode -> verify -> expand per document: the corpus
  content crosses Arrow exactly once, and every per-document product
  (CBOR length, sha invariant, triples) comes back in the same batch.
  Output columns are built with ``pa.array`` directly — no pandas
  object-Series detour (measured ~8% less overhead, lower variance).
* Triples return as **seven parallel flat arrays** rather than one
  array<struct>: Arrow conversion of plain list columns is several
  times cheaper than building struct children from Python tuples, and
  the zip/explode to triple rows happens JVM-side (``arrays_zip`` +
  ``explode`` in operators.kg).
* Errors never throw: each row carries an ``error`` string (quarantine
  column, reference error taxonomy src/encode/error.rs / decode/error.rs)
  so one poison document cannot kill a partition of a million documents.
* Per-executor caching: context processing is memoized process-wide
  (kernel.context), so after the first document of each context chain the
  kernel does no context work at all.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_S = StringType()

# kernel output keyed by content hash (no provenance columns): the
# dedup-first dataflow processes each distinct content once and joins
# provenance back JVM-side
KERNEL_RESULT_SCHEMA = StructType([
    StructField("content_sha", _S, False),
    StructField("doc_sha", _S, True),
    StructField("ok", BooleanType(), False),
    StructField("error", _S, True),
    StructField("error_kind", _S, True),
    StructField("json_len", IntegerType(), False),
    StructField("cbor_len", IntegerType(), True),
    StructField("roundtrip_ok", BooleanType(), True),
    StructField("n_triples", IntegerType(), False),
    StructField("t_subj", ArrayType(_S), True),
    StructField("t_pred", ArrayType(_S), True),
    StructField("t_obj", ArrayType(_S), True),
    StructField("t_is_iri", ArrayType(BooleanType()), True),
    StructField("t_dt", ArrayType(_S), True),
    StructField("t_lang", ArrayType(_S), True),
    StructField("t_graph", ArrayType(_S), True),
])

DOC_RESULT_SCHEMA = StructType([
    StructField("repo", _S, False),
    StructField("path", _S, False),
    StructField("commit", _S, True),
    StructField("doc_sha", _S, True),        # sha256(canonical(doc))
    StructField("content_sha", _S, True),     # sha256(raw content)
    StructField("ok", BooleanType(), False),
    StructField("error", _S, True),
    StructField("error_kind", _S, True),
    StructField("json_len", IntegerType(), False),
    StructField("cbor_len", IntegerType(), True),
    StructField("roundtrip_ok", BooleanType(), True),
    StructField("n_triples", IntegerType(), False),
    StructField("t_subj", ArrayType(_S), True),
    StructField("t_pred", ArrayType(_S), True),
    StructField("t_obj", ArrayType(_S), True),
    StructField("t_is_iri", ArrayType(BooleanType()), True),
    StructField("t_dt", ArrayType(_S), True),
    StructField("t_lang", ArrayType(_S), True),
    StructField("t_graph", ArrayType(_S), True),
])

_COLS = [f.name for f in DOC_RESULT_SCHEMA.fields]
_TRIPLE_COLS = ["t_subj", "t_pred", "t_obj", "t_is_iri", "t_dt", "t_lang",
                "t_graph"]


def jsonld_sniff(lang: Column | None = None) -> Column:
    """JVM-side candidate filter: cheap prefilter before the Python kernel.

    Catalyst pushes the lang equality into the parquet/Iceberg scan;
    the substring checks run in WholeStageCodegen.
    """
    c = F.col("content")
    # rlike, not ltrim+startswith: Spark ltrim strips spaces only, while
    # real files lead with newlines/tabs/BOM
    pred = (c.isNotNull() & c.rlike(r"^[\s﻿]*\{")
            & c.contains("@context"))
    if lang is not None:
        pred = (lang == "json") & pred
    return pred


def _process_one(content: str, registry_id: int, emit_triples: bool):
    """Per-document kernel: returns a result tuple (never raises).

    Tuple layout matches DOC_RESULT_SCHEMA from ``doc_sha`` onward.
    """
    from cbor_ld_spark.kernel import (
        CborLdError,
        content_sha256,
        decode_document,
        encode_document,
        parse_json_document,
    )
    from cbor_ld_spark.kernel.expand import expand_to_triples

    doc_sha = None
    cbor_len = None
    roundtrip_ok = None
    tcols = (None,) * 7
    n_triples = 0
    # compute once, outside try: len() in an except handler would itself
    # raise for null/non-str content and kill the partition
    clen = len(content) if isinstance(content, str) else 0
    if not isinstance(content, str):
        return (None, False, f"content is {type(content).__name__}",
                "InvalidContent", 0, None, None, 0, *((None,) * 7))
    try:
        doc = parse_json_document(content)
        if not isinstance(doc, dict):
            raise CborLdError("ExpectedObject", "root is not an object")
        doc_sha = content_sha256(doc)
        cbor = encode_document(doc, registry_id=registry_id)
        cbor_len = len(cbor)
        back = decode_document(cbor)
        roundtrip_ok = content_sha256(back) == doc_sha
        if emit_triples:
            triples = expand_to_triples(doc)
            prefix = f"_:{doc_sha[:16]}_"
            subj, pred, obj, is_iri, dt, lang, graph = [], [], [], [], [], [], []
            for t in triples:
                # every blank label (minted _:bN and remapped user _:u_*)
                # gets the doc-sha prefix: cross-document uniqueness
                subj.append(prefix + t.subj[2:] if t.subj.startswith("_:")
                            else t.subj)
                pred.append(t.pred)
                obj.append(prefix + t.obj[2:]
                           if t.obj_is_iri and t.obj.startswith("_:")
                           else t.obj)
                is_iri.append(t.obj_is_iri)
                dt.append(t.obj_datatype)
                lang.append(t.obj_lang)
                graph.append(prefix + t.graph[2:]
                             if t.graph.startswith("_:") else t.graph)
            tcols = (subj, pred, obj, is_iri, dt, lang, graph)
            n_triples = len(triples)
        return (doc_sha, True, None, None, clen, cbor_len,
                roundtrip_ok, n_triples, *tcols)
    except CborLdError as e:
        return (doc_sha, False, e.message or e.kind, e.kind, clen,
                cbor_len, roundtrip_ok, 0, *((None,) * 7))
    except Exception as e:  # noqa: BLE001 — quarantine is the contract:
        # no document may kill a partition (OverflowError from huge ints,
        # UnicodeError, etc. all land here as typed rows)
        return (doc_sha, False, str(e)[:500], type(e).__name__, clen,
                cbor_len, roundtrip_ok, 0, *((None,) * 7))


_RESULT_FIELDS = ["doc_sha", "ok", "error", "error_kind", "json_len",
                  "cbor_len", "roundtrip_ok", "n_triples", *_TRIPLE_COLS]


def _pa_result_types():
    """Arrow types for the kernel result fields (lazy: workers only)."""
    import pyarrow as pa

    s = pa.string()
    return {
        "repo": s, "path": s, "commit": s, "content_sha": s, "doc_sha": s,
        "ok": pa.bool_(), "error": s, "error_kind": s,
        "json_len": pa.int32(), "cbor_len": pa.int32(),
        "roundtrip_ok": pa.bool_(), "n_triples": pa.int32(),
        "t_subj": pa.list_(s), "t_pred": pa.list_(s), "t_obj": pa.list_(s),
        "t_is_iri": pa.list_(pa.bool_()), "t_dt": pa.list_(s),
        "t_lang": pa.list_(s), "t_graph": pa.list_(s),
    }


def kg_process_batches(registry_id: int = 1, emit_triples: bool = True,
                       with_provenance: bool = False):
    """mapInArrow kernel fn (Arrow RecordBatch in/out, no pandas).

    Building output columns with ``pa.array`` directly is measurably
    faster and lower-variance than the pandas detour (object-dtype
    Series -> Arrow conversion), and the hot path allocates no pandas
    structures at all.

    ``with_provenance=False``: input (content_sha, content) ->
    KERNEL_RESULT_SCHEMA (the dedup-first dataflow).
    ``with_provenance=True``: input additionally carries
    (repo, path, commit) through -> DOC_RESULT_SCHEMA (per-row path).
    """
    out_schema = DOC_RESULT_SCHEMA if with_provenance else KERNEL_RESULT_SCHEMA
    cols = [f.name for f in out_schema.fields]
    result_idx = {name: i for i, name in enumerate(_RESULT_FIELDS)}

    def fn(batches):
        import pyarrow as pa

        types = _pa_result_types()
        schema = pa.schema([(n, types[n]) for n in cols])
        for batch in batches:
            results = [_process_one(c, registry_id, emit_triples)
                       for c in batch.column("content").to_pylist()]
            arrays = [
                pa.array([r[result_idx[c]] for r in results], type=types[c])
                if c in result_idx else batch.column(c)
                for c in cols
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=schema)

    return fn
