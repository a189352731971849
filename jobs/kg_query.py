#!/usr/bin/env python3
"""spark-submit entrypoint: query a built knowledge graph.

The consumption-side CLI over ``build_kg.py``'s output — BGP and
property-path queries against the ``<kg>/triples`` table without
writing Python:

    # BGP with FILTER / OPTIONAL / NOT EXISTS
    spark-submit jobs/kg_query.py --triples /data/kg/triples \
        --pattern '?cred <https://www.w3.org/2018/credentials#issuer> ?i' \
        --pattern '?cred <https://www.w3.org/2018/credentials#credentialSubject> ?p' \
        --filter "i like 'did:%'" \
        --out /data/answers

    # SPARQL property path (sequence / alternation / ^ / ! / + * ?)
    spark-submit jobs/kg_query.py --triples /data/kg/triples \
        --path '<...#verifiableCredential>?/<...#issuer>' --limit 20

Without --out, prints up to --limit rows as TSV to stdout (small
results only — the point of --out is that answers stay distributed).
Syntax subset is documented in ``operators/sparql.py``.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--triples", required=True,
                    help="parquet dir with (subj, pred, obj, ...) rows")
    ap.add_argument("--pattern", action="append", default=[],
                    help="required BGP pattern 'subj pred obj' "
                         "(repeatable)")
    ap.add_argument("--optional", action="append", default=[],
                    help="OPTIONAL pattern (repeatable)")
    ap.add_argument("--filter", action="append", default=[],
                    help="FILTER boolean SQL expression over the "
                         "bound variables (repeatable)")
    ap.add_argument("--not-exists", action="append", default=[],
                    help="FILTER NOT EXISTS pattern (repeatable)")
    ap.add_argument("--path", default=None,
                    help="property-path expression (mutually exclusive "
                         "with --pattern)")
    ap.add_argument("--out", default=None,
                    help="write the full answer set as parquet here")
    ap.add_argument("--limit", type=int, default=50,
                    help="stdout row cap when --out is not given")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)
    if bool(args.path) == bool(args.pattern):
        ap.error("provide either --path or at least one --pattern")
    if args.path and (args.optional or args.filter or args.not_exists):
        ap.error("--optional/--filter/--not-exists apply to --pattern "
                 "queries only")

    from pyspark.sql import SparkSession

    from cbor_ld_spark.operators.bgp import match_bgp, match_path
    from cbor_ld_spark.operators.sparql import parse_path, parse_pattern

    existing = SparkSession.getActiveSession()
    b = SparkSession.builder.appName("kg_query")
    if args.master:
        b = b.master(args.master)
    spark = b.getOrCreate()
    try:
        triples = spark.read.parquet(args.triples)
        if args.path:
            result = match_path(triples, parse_path(args.path))
        else:
            result = match_bgp(
                triples,
                [parse_pattern(p) for p in args.pattern],
                optional=[parse_pattern(p) for p in args.optional]
                or None,
                filters=args.filter or None,
                not_exists=[parse_pattern(p) for p in args.not_exists]
                or None)
        if args.out:
            result.write.mode("overwrite").parquet(args.out)
            print(f"wrote {spark.read.parquet(args.out).count()} rows "
                  f"to {args.out}")
        else:
            print("\t".join(result.columns))
            for row in result.orderBy(*result.columns)\
                    .limit(args.limit).collect():
                print("\t".join("" if v is None else str(v)
                                for v in row))
        return 0
    finally:
        # stop only a session this invocation created — under tests a
        # shared session is live and must survive the call
        if existing is None:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
