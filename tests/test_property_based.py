"""Property-based tests (hypothesis): N-Triples serialize→parse is the
identity on the term model; the IRI encoder emits only ipchar-safe
output and is deterministic."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from yago4_spark import terms
from yago4_spark.functions.iri import _char_allowed, encode_iri_path_py

# text without lone surrogates (not encodable to UTF-8)
safe_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60
)
lang_tag = st.from_regex(r"[a-z]{2,3}(-[a-z0-9]{1,8})?", fullmatch=True)
iri_text = st.from_regex(r"http://[a-z0-9.]{1,20}/[A-Za-z0-9._~%/-]{0,30}",
                         fullmatch=True)


term_strategy = st.one_of(
    st.builds(terms.item, st.integers(min_value=1, max_value=2**31 - 1)),
    st.builds(terms.prop, st.integers(min_value=1, max_value=99999),
              st.sampled_from(
                  __import__("yago4_spark.vocab", fromlist=["vocab"]).PROPERTY_PREFIXES)),
    st.builds(terms.iri, iri_text),
    st.builds(terms.string, safe_text),
    st.builds(terms.integer, st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    st.builds(terms.lang_string, safe_text, lang_tag),
    st.builds(terms.typed, safe_text, iri_text),
)


@settings(max_examples=300, deadline=None)
@given(s=term_strategy, o=term_strategy, p=st.builds(terms.iri, iri_text))
def test_nt_line_roundtrip(s, p, o):
    line = " ".join(terms.term_to_nt_py(t) for t in (s, p, o)) + " ."
    parsed = terms.parse_nt_line(line)
    assert parsed is not None, line
    ps, pp, po = parsed
    assert ps == s and pp == p and po == o


@settings(max_examples=300, deadline=None)
@given(safe_text)
def test_iri_encoder_output_is_ipchar_safe(path):
    out = encode_iri_path_py(path)
    for c in out:
        assert c == "%" or c in "0123456789ABCDEF" or _char_allowed(c), (
            f"unsafe char {c!r} in {out!r}"
        )
    # deterministic
    assert encode_iri_path_py(path) == out
    # space never survives
    assert " " not in out


@settings(max_examples=200, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False))
def test_format_f64_roundtrips(x):
    s = terms.format_f64(x)
    assert "e" not in s.lower()
    assert float(s) == x
