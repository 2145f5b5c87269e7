"""Unit tests for the term kernel (yago4_ray.terms)."""

from yago4_ray import terms as T


def test_encode_iri_path_vectors():
    # reference vectors: plan.rs:2449-2458
    assert T.encode_iri_path("Dürst") == "Dürst"
    assert T.encode_iri_path("Paris Hilton/Bio") == "Paris_Hilton%2FBio"
    assert T.encode_iri_path("a b") == "a_b"
    assert T.encode_iri_path("x?y#z") == "x%3Fy%23z"


def test_literal_roundtrip():
    lit = T.string_literal('say "hi"\nplease\\ok')
    assert T.literal_value(lit) == 'say "hi"\nplease\\ok'
    assert T.datatype(lit) == T.XSD_STRING

    ls = T.lang_string("café", "fr")
    v, lang, dt = T.parse_literal(ls)
    assert (v, lang, dt) == ("café", "fr", None)
    assert T.datatype(ls) == T.RDF_LANG_STRING

    ty = T.typed_literal("2020-01", T.XSD_G_YEAR_MONTH)
    assert T.datatype(ty) == T.XSD_G_YEAR_MONTH
    assert T.literal_value(ty) == "2020-01"


def test_typed_literal_normalization():
    # xsd:string collapses to a plain literal (model.rs:118-119)
    assert T.typed_literal("x", T.XSD_STRING) == '"x"'
    # integer canonicalized (model.rs:120-122)
    assert T.typed_literal("+05", T.XSD_INTEGER) == T.integer_literal(5)
    # decimal keeps its lexical form (model.rs:125)
    assert T.decimal_literal("+5.30") == f'"+5.30"^^<{T.XSD_DECIMAL}>'
    # dateTime canonicalized to explicit offset
    assert (
        T.typed_literal("2001-02-03T04:05:06Z", T.XSD_DATE_TIME)
        == f'"2001-02-03T04:05:06+00:00"^^<{T.XSD_DATE_TIME}>'
    )


def test_double_format():
    assert T.fmt_double(1.0) == "1"
    assert T.fmt_double(1.5) == "1.5"
    assert T.fmt_double(-2.0) == "-2"
    assert T.fmt_double(0.1) == "0.1"


def test_qid_pid():
    assert T.qid_of(T.wd(42)) == "Q42"
    assert T.qid_of(T.wd("Q5")) == "Q5"
    assert T.qid_of("<http://example.com/Q5>") is None
    assert T.qid_of('"Q5"') is None
    assert T.pid_of(f"<{T.WDT}P31>") == "P31"
    assert T.pid_of(f"<{T.P_PREFIX}P569>") == "P569"
    assert T.pid_of(f"<{T.PSV_PREFIX}P569>") == "P569"
    assert T.pid_of(f"<{T.WD}P569>") == "P569"
    assert T.pid_of(T.wd(42)) is None


def test_parse_ntriples_line():
    line = (
        "<http://www.wikidata.org/entity/Q42> "
        "<http://www.w3.org/2004/02/skos/core#prefLabel> "
        '"Douglas Adams"@en .'
    )
    s, p, o = T.parse_ntriples_line(line)
    assert s == T.wd(42)
    assert p == T.SKOS_PREF_LABEL
    assert o == '"Douglas Adams"@en'

    # typed literal normalization at parse
    line2 = '<http://e/a> <http://e/p> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .'
    assert T.parse_ntriples_line(line2)[2] == T.integer_literal(7)

    # bad lines skipped
    assert T.parse_ntriples_line("") is None
    assert T.parse_ntriples_line("# comment") is None
    assert T.parse_ntriples_line("garbage line") is None


def test_escaped_literal_in_line():
    line = '<http://e/a> <http://e/p> "a\\"b\\nc"@ast .'
    s, p, o = T.parse_ntriples_line(line)
    assert T.parse_literal(o)[0] == 'a"b\nc'
    assert T.parse_literal(o)[1] == "ast"


def test_camel_case():
    assert T.camel_case_to_regular("fooBar") == "foo bar"
    assert T.camel_case_to_regular("FooBar") == "foo bar"
    assert T.camel_case_to_regular("foo") == "foo"
    assert T.term_camel_case_to_regular('"givenName"@en') == '"given name"@en'
    assert T.term_camel_case_to_regular(T.wd(5)) == T.wd(5)


def test_format_triple():
    assert T.format_triple("<a>", "<b>", '"c"') == '<a>\t<b>\t"c"\t.'
    assert (
        T.format_annotated_triple("<a>", "<b>", "<c>", "<d>", "<e>")
        == "<<\t<a>\t<b>\t<c>\t>>\t<d>\t<e>\t."
    )


def test_string_name():
    assert T.string_name(["<http://schema.org/Person>"]) == "schema-Person"
    assert (
        T.string_name(["<http://schema.org/birthDate>", f"<{T.XSD}date>"])
        == "schema-birthDate-xsd-date"
    )


def test_fmt_double_rust_display_semantics():
    """xsd:double canonicalization matches the reference's Rust f64
    Display serialization (model.rs:117-135, 244-248): positional
    notation, shortest digits, NaN string-equal (model.rs:159-207)."""
    from yago4_ray.terms import XSD_DOUBLE, fmt_double, typed_literal

    assert fmt_double(1.0) == "1"
    assert fmt_double(1.5) == "1.5"
    assert fmt_double(1e30) == "1" + "0" * 30
    assert fmt_double(1e-7) == "0.0000001"
    assert fmt_double(-0.0) == "-0"
    assert fmt_double(float("nan")) == "NaN"
    # distinct lexical forms of one double value dedup to ONE canonical
    # term, like the reference's parse-time f64 normalization
    assert (
        typed_literal("1.0E0", XSD_DOUBLE)
        == typed_literal("1", XSD_DOUBLE)
        == '"1"^^<http://www.w3.org/2001/XMLSchema#double>'
    )
    assert typed_literal("NaN", XSD_DOUBLE) == typed_literal("nan", XSD_DOUBLE)
