"""Golden tests for the RFC-3987 ipchar IRI path encoder — goldens taken
from the reference's own unit test (src/plan.rs:2449-2458) plus edge cases
derived from the charset spec (src/plan.rs:2412-2447)."""

from __future__ import annotations

import pandas as pd

from yago4_spark.functions.iri import (
    encode_iri_path_py,
    encode_iri_path_series,
    percent_decode_py,
)


def test_reference_goldens():
    assert encode_iri_path_py("Dürst") == "Dürst"
    assert encode_iri_path_py("Paris Hilton/Bio") == "Paris_Hilton%2FBio"


def test_space_to_underscore():
    assert encode_iri_path_py("a b c") == "a_b_c"


def test_safe_ascii_passthrough():
    safe = "AZaz09-._~:@!$&'()*+,;="
    assert encode_iri_path_py(safe) == safe


def test_unsafe_ascii_percent_encoded_uppercase_unpadded():
    # '/' = 0x2F → %2F ; '\n' = 0x0A → %A (the reference's %{:X} does NOT
    # zero-pad, src/plan.rs:2443)
    assert encode_iri_path_py("/") == "%2F"
    assert encode_iri_path_py("\n") == "%A"
    assert encode_iri_path_py("?") == "%3F"
    assert encode_iri_path_py("#") == "%23"
    assert encode_iri_path_py('"') == "%22"


def test_multibyte_outside_ranges():
    # U+E000 (private use, not in any allowed range) → UTF-8 EE 80 80
    assert encode_iri_path_py("") == "%EE%80%80"
    # U+FFFF is outside FDF0..FFEF
    assert encode_iri_path_py("￿") == "%EF%BF%BF"
    # emoji U+1F600 is inside 10000..EFFFD → passes
    assert encode_iri_path_py("\U0001F600") == "\U0001F600"


def test_series_vectorized():
    s = pd.Series(["Paris Hilton/Bio", None, "Dürst"])
    out = encode_iri_path_series(s)
    assert out.tolist()[0] == "Paris_Hilton%2FBio"
    assert out.tolist()[2] == "Dürst"


def test_percent_decode():
    assert percent_decode_py("Paris%20Hilton%2FBio") == "Paris Hilton/Bio"
