"""Property-based tests (hypothesis) for the pure kernels."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from yago4_ray import terms as T
from yago4_ray.dataops.dedup import ngram_jaccard, shingles, simhash64
from yago4_ray.turtle import parse_turtle

text_values = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
)
langs = st.from_regex(r"[a-z]{2,3}(-[A-Za-z0-9]{1,8})?", fullmatch=True)


@settings(max_examples=200)
@given(text_values)
def test_string_literal_roundtrip(value):
    term = T.string_literal(value)
    assert T.literal_value(term) == value
    assert T.datatype(term) == T.XSD_STRING


@settings(max_examples=200)
@given(text_values, langs)
def test_lang_string_roundtrip(value, lang):
    term = T.lang_string(value, lang)
    got_value, got_lang, got_dt = T.parse_literal(term)
    assert (got_value, got_lang, got_dt) == (value, lang, None)
    assert T.datatype(term) == T.RDF_LANG_STRING


@settings(max_examples=200)
@given(text_values)
def test_ntriples_line_roundtrip(value):
    line = T.format_triple("<http://e/s>", "<http://e/p>", T.string_literal(value))
    parsed = T.parse_ntriples_line(line)
    assert parsed is not None
    assert T.literal_value(parsed[2]) == value


@settings(max_examples=100)
@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_integer_literal_roundtrip(n):
    term = T.integer_literal(n)
    assert int(T.literal_value(term)) == n
    assert T.datatype(term) == T.XSD_INTEGER


@settings(max_examples=100)
@given(text_values)
def test_encode_iri_path_is_ascii_safe_or_ucschar(path):
    encoded = T.encode_iri_path(path)
    # no ASCII spaces/controls, no IRI-breaking delimiters (NBSP-class
    # ucschar whitespace legitimately passes through per RFC 3987)
    assert " " not in encoded
    assert re.fullmatch(
        r"(?:[^ \t\n\r\f\v<>\"{}|\\^`%]|%[0-9A-F]+)*", encoded
    ) is not None


@settings(max_examples=100)
@given(text_values)
def test_turtle_string_roundtrip(value):
    # turtle-escape the value the way a writer would
    escaped = (
        value.replace("\\", "\\\\").replace('"', '\\"')
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
    )
    doc = f'@prefix ex: <http://e/> .\nex:s ex:p "{escaped}" .'
    triples = parse_turtle(doc)
    assert len(triples) == 1
    assert T.literal_value(triples[0][2]) == value


@settings(max_examples=50)
@given(st.text(min_size=0, max_size=200))
def test_simhash_deterministic(text):
    assert simhash64(text) == simhash64(text)
    assert 0 <= simhash64(text) < 2**64


@settings(max_examples=50)
@given(st.text(min_size=0, max_size=120), st.text(min_size=0, max_size=120))
def test_jaccard_bounds_and_symmetry(a, b):
    j = ngram_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == ngram_jaccard(b, a)
    assert ngram_jaccard(a, a) == 1.0


@settings(max_examples=50)
@given(st.text(min_size=5, max_size=120))
def test_shingles_stable(text):
    s1 = set(shingles(text).tolist())
    s2 = set(shingles(text).tolist())
    assert s1 == s2 and len(s1) > 0


@settings(max_examples=30)
@given(
    st.lists(
        st.text(min_size=1, max_size=40), min_size=1, max_size=200, unique=True
    )
)
def test_prehashed_set_matches_string_set(keys):
    """HashedSet.from_prehashed (hashes computed task-side) must answer
    membership identically to the string-built HashedSet."""
    import pandas as pd

    from yago4_ray.broadcast import HashedSet, _hash_series

    a = HashedSet(keys)
    b = HashedSet.from_prehashed(_hash_series(keys), len(keys))
    probes = pd.Series(keys + ["@@absent@@", "", "x" * 50], dtype=object)
    assert (a.contains(probes) == b.contains(probes)).all()


def test_multimap_from_columns_matches_dict():
    import pandas as pd

    from yago4_ray.broadcast import HashedMultiMap

    mapping = {f"k{i}": (f"o{i}", f"e{i}" if i % 3 else "") for i in range(500)}
    a = HashedMultiMap(mapping)
    keys = pd.Series(list(mapping))
    b = HashedMultiMap.from_columns(
        keys,
        pd.Series([mapping[k][0] for k in keys]),
        pd.Series([mapping[k][1] for k in keys]),
    )
    probes = pd.Series(list(mapping) + ["missing1", "missing2"], dtype=object)
    ao, ae = a.lookup(probes)
    bo, be = b.lookup(probes)
    assert list(ao) == list(bo) and list(ae) == list(be)
    assert a.get("k7") == b.get("k7") == ("o7", "e7")
    assert a.get("nope") is None and b.get("nope") is None
