"""Arrow-batched kernel UDFs (the only Python in the hot path).

Design for 100 TB:

* ``jsonld_sniff`` is a pure-Column predicate — it runs JVM-side inside
  WholeStageCodegen *before* any Python, so non-candidate bytes (most of
  a source-code corpus) never cross the JVM<->Python boundary and the
  filter pushes into the scan.
* ``kg_process_batches`` is a single ``mapInPandas`` pass doing
  parse -> encode -> decode -> verify -> expand per document: the corpus
  content crosses Arrow exactly once, and every per-document product
  (CBOR bytes length, sha invariant, triples) comes back in the same
  batch.  Triples return as a nested array<struct> column; the explode to
  triple rows happens JVM-side.
* Errors never throw: each row carries an ``error`` string (quarantine
  column, reference error taxonomy src/encode/error.rs / decode/error.rs)
  so one poison document cannot kill a partition of a million documents.
* Per-executor caching: context processing is memoized process-wide
  (kernel.context), so after the first document of each context chain the
  kernel does no context work at all.
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

TRIPLE_STRUCT = StructType([
    StructField("subj", StringType(), False),
    StructField("pred", StringType(), False),
    StructField("obj", StringType(), False),
    StructField("obj_is_iri", BooleanType(), False),
    StructField("obj_datatype", StringType(), True),
    StructField("obj_lang", StringType(), True),
    StructField("graph", StringType(), False),
])

DOC_RESULT_SCHEMA = StructType([
    StructField("repo", StringType(), False),
    StructField("path", StringType(), False),
    StructField("commit", StringType(), True),
    StructField("doc_sha", StringType(), True),       # sha256(canonical(doc))
    StructField("content_sha", StringType(), True),    # sha256(raw content)
    StructField("ok", BooleanType(), False),
    StructField("error", StringType(), True),
    StructField("error_kind", StringType(), True),
    StructField("json_len", IntegerType(), False),
    StructField("cbor_len", IntegerType(), True),
    StructField("roundtrip_ok", BooleanType(), True),
    StructField("n_triples", IntegerType(), False),
    StructField("triples", ArrayType(TRIPLE_STRUCT), True),
])


def jsonld_sniff(lang: Column | None = None) -> Column:
    """JVM-side candidate filter: cheap prefilter before the Python kernel.

    Catalyst pushes the lang equality into the parquet/Iceberg scan;
    the substring checks run in WholeStageCodegen.
    """
    c = F.col("content")
    pred = c.isNotNull() & c.startswith("{") & c.contains("@context")
    if lang is not None:
        pred = (lang == "json") & pred
    return pred


def _process_one(content: str, registry_id: int, emit_triples: bool):
    """Per-document kernel: returns dict of result fields (never raises)."""
    # Imported lazily so the module ships to executors cheaply.
    from cbor_ld_spark.kernel import (
        CborLdError,
        canonical_json,
        content_sha256,
        decode_document,
        encode_document,
        parse_json_document,
    )
    from cbor_ld_spark.kernel.expand import expand_to_triples

    out = {
        "doc_sha": None, "ok": False, "error": None, "error_kind": None,
        "json_len": len(content), "cbor_len": None, "roundtrip_ok": None,
        "n_triples": 0, "triples": None,
    }
    try:
        doc = parse_json_document(content)
        if not isinstance(doc, dict):
            raise CborLdError("ExpectedObject", "root is not an object")
        doc_sha = content_sha256(doc)
        out["doc_sha"] = doc_sha
        cbor = encode_document(doc, registry_id=registry_id)
        out["cbor_len"] = len(cbor)
        back = decode_document(cbor)
        out["roundtrip_ok"] = content_sha256(back) == doc_sha
        if emit_triples:
            triples = expand_to_triples(doc)
            prefix = f"_:{doc_sha[:16]}_"
            rows = []
            for t in triples:
                subj = prefix + t.subj[2:] if t.subj.startswith("_:b") else t.subj
                obj = (prefix + t.obj[2:]
                       if t.obj_is_iri and t.obj.startswith("_:b") else t.obj)
                graph = (prefix + t.graph[2:]
                         if t.graph.startswith("_:b") else t.graph)
                rows.append((subj, t.pred, obj, t.obj_is_iri,
                             t.obj_datatype, t.obj_lang, graph))
            out["triples"] = rows
            out["n_triples"] = len(rows)
        out["ok"] = True
    except CborLdError as e:
        out["error"] = e.message or e.kind
        out["error_kind"] = e.kind
    except (ValueError, RecursionError, TypeError) as e:
        out["error"] = str(e)[:500]
        out["error_kind"] = type(e).__name__
    return out


def kg_process_batches(registry_id: int = 1, emit_triples: bool = True):
    """Build the mapInPandas function for the KG kernel pass."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            results = []
            for repo, path, commit, content in zip(
                pdf["repo"], pdf["path"], pdf["commit"], pdf["content"]
            ):
                r = _process_one(content, registry_id, emit_triples)
                r["repo"] = repo
                r["path"] = path
                r["commit"] = commit
                r["content_sha"] = hashlib.sha256(
                    content.encode("utf-8")).hexdigest()
                results.append(r)
            yield pd.DataFrame(
                results,
                columns=[f.name for f in DOC_RESULT_SCHEMA.fields],
            )

    return fn
