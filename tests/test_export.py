"""N-Triples/N-Quads formatter: escaping + term-form edge cases."""


def _t(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean, "
              "obj_datatype string, obj_lang string, graph string")


def test_ntriples_term_forms_and_escaping(spark):
    from cbor_ld_spark.operators.export import format_quad_py, to_ntriples

    rows = [
        ("http://s", "http://p", "http://o", True, None, None, ""),
        ("_:b0", "http://p", "_:b1", True, None, None, ""),
        ("http://s", "http://p", 'say "hi"\n\tback\\slash', False,
         "http://www.w3.org/2001/XMLSchema#string", None, ""),
        ("http://s", "http://p", "21", False,
         "http://www.w3.org/2001/XMLSchema#integer", None, ""),
        ("http://s", "http://p", "bonjour", False, None, "fr", ""),
        ("http://s", "http://p", "in-graph", False, None, None, "_:g0"),
    ]
    got = sorted(r["line"] for r in
                 to_ntriples(_t(spark, rows), quads=True).collect())
    expect = sorted(format_quad_py(*r) for r in rows)
    assert got == expect
    joined = "\n".join(got)
    # spec spot-checks: escapes, bare xsd:string, typed, lang, graph term
    assert '"say \\"hi\\"\\n\\tback\\\\slash"' in joined
    assert '"21"^^<http://www.w3.org/2001/XMLSchema#integer>' in joined
    assert '"bonjour"@fr' in joined
    assert '"in-graph" _:g0 .' in joined
    assert '<http://s> <http://p> <http://o> .' in joined
    assert "_:b0 <http://p> _:b1 ." in joined
    # xsd:string stays bare (no ^^ suffix)
    assert '"say' in joined and 'string>' not in joined.split("\n")[
        [i for i, ln in enumerate(got) if "say" in ln][0]]


def test_ntriples_distinct_set_semantics(spark):
    from cbor_ld_spark.operators.export import to_ntriples

    rows = [("http://s", "http://p", "http://o", True, None, None, "")] * 3
    assert to_ntriples(_t(spark, rows)).count() == 1
    assert to_ntriples(_t(spark, rows), distinct=False).count() == 3
