"""Driver-side name helper tests — exact reference behaviors
(src/plan.rs:2032-2076, src/vocab.rs:5-14); cross-checked against the
compiled reference functions by scripts/rust_differential.py."""

from yago4_spark.functions.names import (
    camel_case_to_regular,
    list_blank_labels,
    string_name,
)


def test_camel_case_to_regular():
    assert camel_case_to_regular("fooBar") == "foo bar"
    assert camel_case_to_regular("birthDate") == "birth date"
    assert camel_case_to_regular("CreativeWork") == "creative work"
    # the reference lowers EVERY uppercase char (plan.rs:2061-2076) —
    # acronyms are not preserved
    assert camel_case_to_regular("ISBN") == "i s b n"
    assert camel_case_to_regular("HTMLElement") == "h t m l element"
    assert camel_case_to_regular("already spaced Word") == "already spaced word"


def test_string_name():
    assert string_name("http://schema.org/Person") == "schema-Person"
    assert string_name("http://www.w3.org/2001/XMLSchema#date") == "xsd-date"
    # unknown namespace: only '/', '?', '#' are stripped (plan.rs:2041)
    assert string_name("http://unknown.example/x y") == "http:unknown.examplex y"


def test_list_blank_labels():
    # labels are keyed by the member set, 1-based from the head
    # (add_list_object, plan.rs:2000-2029)
    labels = list_blank_labels(
        ["http://schema.org/Book", "http://schema.org/Movie"])
    assert labels == [
        "list-schema-Book-schema-Movie-1",
        "list-schema-Book-schema-Movie-2",
    ]
    assert labels == list_blank_labels(
        ["http://schema.org/Book", "http://schema.org/Movie"])
