"""IRI path encoding — the custom RFC-3987 ``ipchar`` percent-encoder.

Behavioral spec from the reference (``src/plan.rs:2412-2447``):
space → ``_``; ASCII unreserved + sub-delims + ``:@`` pass through;
the RFC-3987 ``ucschar`` unicode ranges pass through; every other char is
percent-encoded per UTF-8 byte with UPPERCASE, NON-ZERO-PADDED hex
(the reference formats bytes with ``%{:X}`` — byte 0x0A becomes ``%A``).

``urllib.parse.quote`` does NOT match (different safe set, no ``_`` for
space, zero-padded hex), hence this hand-rolled translate-table encoder.
Goldens from the reference's own test (src/plan.rs:2449-2458):
``Dürst → Dürst``, ``Paris Hilton/Bio → Paris_Hilton%2FBio``.

Exposed as an Arrow-vectorized pandas UDF (batch ``str.translate`` on a
lazily-built table — no per-row Python UDF).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_SAFE_ASCII = set(
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789"
    "-._~:@!$&'()*+,;="
)


def _char_allowed(c: str) -> bool:
    if c in _SAFE_ASCII:
        return True
    cp = ord(c)
    return (
        0xA0 <= cp <= 0xD7FF
        or 0xF900 <= cp <= 0xFDCF
        or 0xFDF0 <= cp <= 0xFFEF
        or 0x10000 <= cp <= 0xEFFFD
    )


def _encode_char(c: str) -> str:
    return "".join(f"%{b:X}" for b in c.encode("utf-8"))


class _EncodeTable(dict):
    """Lazy str.translate table: maps codepoint → replacement (or None to
    keep). Built on demand so the full unicode range is never materialized."""

    def __missing__(self, cp: int) -> str | None:
        c = chr(cp)
        if c == " ":
            out = "_"
        elif _char_allowed(c):
            out = c
        else:
            out = _encode_char(c)
        self[cp] = out
        return out


_TABLE = _EncodeTable()


def encode_iri_path_py(path: str) -> str:
    return path.translate(_TABLE)


def percent_decode_py(value: str) -> str:
    """Decode %XX sequences (enwiki titles are decoded before re-encoding,
    src/plan.rs:302-309)."""
    from urllib.parse import unquote

    return unquote(value)


def encode_iri_path_series(s: pd.Series) -> pd.Series:
    return s.map(lambda v: v if v is None else v.translate(_TABLE))


encode_iri_path = F.pandas_udf(encode_iri_path_series, StringType())


def _decode_then_encode(s: pd.Series) -> pd.Series:
    from urllib.parse import unquote

    return s.map(lambda v: v if v is None else unquote(v).translate(_TABLE))


decode_then_encode_iri_path = F.pandas_udf(_decode_then_encode, StringType())


def yago_resource_iri(encoded_title: Column) -> Column:
    return F.concat(F.lit("http://yago-knowledge.org/resource/"), encoded_title)
