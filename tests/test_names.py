"""Driver-side name helper tests (reference behaviors
src/plan.rs:2032-2076)."""

from yago4_spark.functions.names import (
    camel_case_to_regular,
    list_blank_labels,
    string_name,
)


def test_camel_case_to_regular():
    assert camel_case_to_regular("fooBar") == "foo bar"
    assert camel_case_to_regular("birthDate") == "birth date"
    assert camel_case_to_regular("CreativeWork") == "creative work"
    assert camel_case_to_regular("ISBN") == "ISBN"
    assert camel_case_to_regular("HTMLElement") == "HTML element"


def test_string_name():
    assert string_name("http://schema.org/Person") == "schema:Person"
    assert string_name("http://www.w3.org/2001/XMLSchema#date") == "xsd:date"
    assert string_name("http://unknown.example/x y") == "http:__unknown.example_x_y"


def test_list_blank_labels():
    labels = list_blank_labels("http://schema.org/author", ["a", "b"])
    assert labels == ["list-schema_author-0", "list-schema_author-1"]
    assert labels == list_blank_labels("http://schema.org/author", ["a", "b"])
