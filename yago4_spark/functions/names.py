"""Driver-side name helpers (SURVEY §2.7, config-sized data only).

- camel_case_to_regular: "fooBar" → "foo bar" for class/property labels
  in the schema output (src/plan.rs:2050-2076). Rule: split on case
  transitions; an UPPER run followed by lower keeps its last capital with
  the next word ("HTMLElement" → "HTML element"); single leading capitals
  lowercase unless part of an acronym run.
- string_name: IRI → prefixed short name for deterministic blank-node
  labels in owl:unionOf lists (src/plan.rs:2032-2047).
"""

from __future__ import annotations

import re

from .. import vocab

_PREFIXES = {
    vocab.SCHEMA: "schema:",
    vocab.XSD: "xsd:",
    vocab.RDF: "rdf:",
    vocab.RDFS: "rdfs:",
    vocab.OWL: "owl:",
    vocab.SH: "sh:",
    vocab.YS: "ys:",
    vocab.YAGO_RESOURCE_PREFIX: "yago:",
    vocab.WD: "wd:",
}

_CAMEL_RE = re.compile(
    r"[A-Z]+(?![a-z])|[A-Z][a-z]*|[a-z]+|[0-9]+"
)


def camel_case_to_regular(name: str) -> str:
    """fooBar → foo bar; HTMLElement → HTML element; ISBN → ISBN."""
    words = _CAMEL_RE.findall(name)
    out = []
    for w in words:
        if w.isupper() and len(w) > 1:
            out.append(w)  # acronym kept
        else:
            out.append(w.lower())
    return " ".join(out)


def string_name(iri: str) -> str:
    """IRI → short prefixed name, '_'-safe, for blank node labels."""
    for ns, prefix in _PREFIXES.items():
        if iri.startswith(ns):
            return prefix + iri[len(ns):]
    return re.sub(r"[^A-Za-z0-9_.:\-]", "_", iri)


def list_blank_labels(owner: str, items: list[str]) -> list[str]:
    """Deterministic blank-node labels for an RDF list owned by ``owner``:
    list-{owner-short}-{i} (src/plan.rs:2000-2029 uses the same scheme)."""
    short = re.sub(r"[^A-Za-z0-9_.\-]", "_", string_name(owner))
    return [f"list-{short}-{i}" for i in range(len(items))]
