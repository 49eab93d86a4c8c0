"""Driver-side name helpers (SURVEY §2.7, config-sized data only).

- camel_case_to_regular: "fooBar" → "foo bar" for class/property labels
  in the schema output — an exact port of the reference's per-char rule
  (src/plan.rs:2061-2076): EVERY uppercase char is space-prefixed
  (unless the previous output char is ASCII whitespace) and lowercased
  with the full Unicode mapping, so "HTMLElement" → "h t m l element"
  and "ISBN" → "i s b n" (acronyms are NOT preserved).
- string_name: IRI → dash-prefixed short name for deterministic blank
  node labels, using the reference's 8-entry prefix table
  (src/vocab.rs:5-14) with "-" as separator; unknown IRIs keep all
  chars except '/', '?', '#' (src/plan.rs:2032-2047).
- string_names / list_blank_labels: blank labels for RDF lists are
  keyed by the MEMBER SET, not the owner ("list-{names}-{i}", 1-based
  from the head — src/plan.rs:2000-2029), so two unions over the same
  members share cons cells exactly like the reference.

Verified against the compiled reference functions by
scripts/rust_differential.py (std-only rustc harness).
"""

from __future__ import annotations

from .. import vocab

# (prefix, namespace) in the reference's iteration order (vocab.rs:5-14)
_NAME_PREFIXES = (
    ("bioschema", "http://bioschemas.org/"),
    ("owl", vocab.OWL),
    ("rdf", vocab.RDF),
    ("rdfs", vocab.RDFS),
    ("schema", vocab.SCHEMA),
    ("xsd", vocab.XSD),
    ("yago", vocab.YAGO_RESOURCE_PREFIX),
    ("yagov", vocab.YAGO_VALUE_PREFIX),
)

_ASCII_WS = " \t\n\r\x0c"


def camel_case_to_regular(txt: str) -> str:
    """Exact port of caml_case_to_regular (src/plan.rs:2061-2076)."""
    out: list[str] = []
    for c in txt:
        if c.isupper():
            if out and out[-1][-1] not in _ASCII_WS:
                out.append(" ")
            out.append(c.lower())  # full Unicode mapping, may expand
        else:
            out.append(c)
    return "".join(out)


def string_name(iri: str) -> str:
    """IRI → short name for blank labels (string_name, plan.rs:2032-2047)."""
    for prefix, ns in _NAME_PREFIXES:
        if iri.startswith(ns):
            return prefix + "-" + iri[len(ns):]
    return iri.replace("/", "").replace("?", "").replace("#", "")


def string_names(iris: list[str]) -> str:
    return "-".join(string_name(i) for i in iris)


def list_blank_labels(items: list[str]) -> list[str]:
    """Deterministic blank labels for the cons cells of an RDF list whose
    members are ``items`` (IRIs): ``list-{names}-{i}``, i = 1 at the head
    (add_list_object, src/plan.rs:2000-2029)."""
    name = f"list-{string_names(items)}-"
    return [f"{name}{i + 1}" for i in range(len(items))]
