"""True Rust differential for the lexical-fidelity layer.

The full binary differential (cargo build of /root/reference, then
output-set compare) is infeasible in this sandbox: the crate registry is
unreachable (`Could not resolve host`) and the reference needs 11 crates
(rocksdb, rio, chrono, ...) with no vendor dir. What IS possible offline
is `rustc` on std-only code — and the reference's entire lexical-fidelity
layer is std-only:

    encode_iri_path           src/plan.rs:2412-2447  (custom ipchar set)
    round_degrees             src/plan.rs:1570-1575  (+ f64 Display into
                              the geo IRI, plan.rs:1544)
    caml_case_to_regular      src/plan.rs:2061-2076  (Unicode lowercase)
    string_name               src/plan.rs:2031-2047  (blank-node labels)
    convert_duration_quantity src/plan.rs:1578-1630  (i128 + sign quirk)
    convert_integer_quantity  src/plan.rs:1633-1641  (i64 range gate)
    convert_time              src/plan.rs:1498-1524  (precision dispatch;
                              chrono formatting shimmed, see below)
    f64 `{}` Display          std (model.rs:245, plan.rs:1544)
    NT literal escaping       src/model.rs:226-266 → rio_api Literal
                              Display (spec-implemented, see below)

Two families use a shim instead of pure extraction, because their Rust
side lives in unreachable crates:

- ``convert_time``'s BODY is extracted verbatim (the precision dispatch
  and format strings are the reference's own code); only chrono's
  ``DateTime<FixedOffset>`` is replaced by a std struct implementing
  the exact documented chrono semantics for the three format strings
  the body uses (%Y zero-pads |year| to 4 digits, keeps '-', adds '+'
  for years ≥ 10000) and ``to_rfc3339`` (offset always ±HH:MM, never
  'Z'). Corpus domain = Wikidata dump lexical space (second precision,
  no fractional seconds).
- NT literal escaping: rio's Display escapes exactly {'"', '\\', LF,
  CR} per the N-Triples spec — the 4-line match below IS that spec,
  written out (nothing of rio is copied).

This script extracts those function bodies VERBATIM from the read-only
reference tree at run time (nothing is vendored into this repo), wraps
them in a minimal std-only shim (enum + consts the functions reference),
compiles with `rustc -O`, and streams generated corpora through the
binary, comparing every output against this repo's implementations.
The oracle is therefore the reference's own code as compiled by rustc —
not a same-author re-derivation.

Run standalone:  python scripts/rust_differential.py
From pytest:     tests/test_rust_differential.py (skips if rustc absent)
"""

from __future__ import annotations

import hashlib
import json
import math
import random
import re
import shutil
import struct
import subprocess
import sys
import tempfile
from pathlib import Path

REFERENCE = Path("/root/reference")
PLAN_RS = REFERENCE / "src" / "plan.rs"
VOCAB_RS = REFERENCE / "src" / "vocab.rs"

_FNS = (
    "encode_iri_path",
    "round_degrees",
    "caml_case_to_regular",
    "string_name",
    "convert_duration_quantity",
    "convert_integer_quantity",
    "convert_time",
)

# ---------------------------------------------------------------------------
# harness generation
# ---------------------------------------------------------------------------


def _extract_fn(src: str, name: str) -> str:
    """The full text of `fn name...` up to its balanced closing brace."""
    m = re.search(rf"^(?:pub )?fn {name}\b", src, re.M)
    if not m:
        raise RuntimeError(f"reference function {name} not found")
    i = src.index("{", m.start())
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                return src[m.start():j + 1]
    raise RuntimeError(f"unbalanced braces extracting {name}")


def _extract_prefixes(src: str) -> str:
    m = re.search(r"^pub const PREFIXES.*?\]\s*;", src, re.M | re.S)
    if not m:
        raise RuntimeError("PREFIXES const not found in vocab.rs")
    return m.group(0).replace("pub const", "const")


_SHIM = r"""
// Minimal std-only shim: just enough types/consts for the verbatim
// reference functions below to compile. Everything in REFERENCE BODIES
// is extracted unmodified from /root/reference/src/{plan,vocab}.rs.
#![allow(dead_code, clippy::all)]
use std::fmt::Write;
use std::io::{self, BufRead, Write as IoWrite};
use std::iter::once;
use std::str::FromStr;

// std stand-in for chrono::DateTime<FixedOffset>, restricted to the
// three format strings convert_time uses plus to_rfc3339, implementing
// chrono's documented semantics: %Y zero-pads |year| to 4 digits and
// prints '+' for years >= 10000; to_rfc3339 always renders the offset
// as +HH:MM / -HH:MM (never 'Z'); no fractional seconds in the corpus.
#[derive(Clone, Debug, PartialEq)]
struct DateTime {
    y: i64,
    mo: u32,
    d: u32,
    h: u32,
    mi: u32,
    s: u32,
    off_min: i32,
}

impl DateTime {
    fn fmt_year(&self) -> String {
        if self.y >= 10000 {
            format!("+{}", self.y)
        } else if self.y >= 0 {
            format!("{:04}", self.y)
        } else {
            format!("-{:04}", -self.y)
        }
    }
    fn format(&self, fmt: &str) -> String {
        match fmt {
            "%Y" => self.fmt_year(),
            "%Y-%m" => format!("{}-{:02}", self.fmt_year(), self.mo),
            "%Y-%m-%d" => {
                format!("{}-{:02}-{:02}", self.fmt_year(), self.mo, self.d)
            }
            _ => panic!("unsupported format {}", fmt),
        }
    }
    fn to_rfc3339(&self) -> String {
        let (sign, off) = if self.off_min < 0 {
            ('-', -self.off_min)
        } else {
            ('+', self.off_min)
        };
        format!(
            "{}-{:02}-{:02}T{:02}:{:02}:{:02}{}{:02}:{:02}",
            self.fmt_year(), self.mo, self.d, self.h, self.mi, self.s,
            sign, off / 60, off % 60
        )
    }
}

#[derive(Clone, Debug, PartialEq)]
enum YagoTerm {
    WikidataItem(u32),
    Iri(String),
    StringLiteral(String),
    IntegerLiteral(i64),
    DecimalLiteral(String),
    DateTimeLiteral(DateTime),
    LanguageTaggedString(String, String),
    TypedLiteral(String, String),
}

impl std::fmt::Display for YagoTerm {
    fn fmt(&self, f: &mut std::fmt::Formatter<'_>) -> std::fmt::Result {
        write!(f, "{:?}", self)
    }
}

#[derive(Clone, Copy)]
struct W(u32);
impl From<W> for YagoTerm {
    fn from(w: W) -> YagoTerm {
        YagoTerm::WikidataItem(w.0)
    }
}
const WD_Q11574: W = W(11574);
const WD_Q7727: W = W(7727);
const WD_Q25235: W = W(25235);
const WD_Q573: W = W(573);
const WD_Q199: W = W(199);
const WD_Q1985727: W = W(1985727);

struct N {
    iri: &'static str,
}
const XSD_DURATION: N = N {
    iri: "http://www.w3.org/2001/XMLSchema#duration",
};
const XSD_G_YEAR: N = N {
    iri: "http://www.w3.org/2001/XMLSchema#gYear",
};
const XSD_G_YEAR_MONTH: N = N {
    iri: "http://www.w3.org/2001/XMLSchema#gYearMonth",
};
const XSD_DATE: N = N {
    iri: "http://www.w3.org/2001/XMLSchema#date",
};
"""

_MAIN = r"""
fn hexbits(s: &str) -> f64 {
    f64::from_bits(u64::from_str_radix(s, 16).unwrap())
}

fn main() {
    let stdin = io::stdin();
    let stdout = io::stdout();
    let mut out = stdout.lock();
    for line in stdin.lock().lines() {
        let line = line.unwrap();
        let (op, rest) = match line.split_once('\t') {
            Some(p) => p,
            None => (line.as_str(), ""),
        };
        let result = match op {
            "iri" => {
                let mut s = String::new();
                encode_iri_path(rest, &mut s);
                s
            }
            "f64" => format!("{}", hexbits(rest)),
            "geo" => {
                let mut it = rest.split('\t');
                let lat = hexbits(it.next().unwrap());
                let lon = hexbits(it.next().unwrap());
                let prec = hexbits(it.next().unwrap());
                // the geo IRI composition, plan.rs:1541-1546
                format!(
                    "geo:{},{}",
                    round_degrees(lat, prec),
                    round_degrees(lon, prec)
                )
            }
            "caml" => caml_case_to_regular(rest),
            "sname" => string_name(once(&YagoTerm::Iri(rest.to_owned()))),
            "dur" | "intq" => {
                let mut it = rest.split('\t');
                let amount = it.next().unwrap().to_owned();
                let qid: u32 = it.next().unwrap().parse().unwrap();
                let conv = if op == "dur" {
                    convert_duration_quantity
                } else {
                    convert_integer_quantity
                };
                match conv(
                    YagoTerm::DecimalLiteral(amount),
                    YagoTerm::WikidataItem(qid),
                ) {
                    Some(YagoTerm::TypedLiteral(v, dt)) => format!("{}\t{}", v, dt),
                    Some(YagoTerm::IntegerLiteral(v)) => format!("{}", v),
                    Some(t) => format!("OTHER:{}", t),
                    None => "NONE".to_owned(),
                }
            }
            "ctime" => {
                let mut it = rest.split('\t');
                let mut n = || it.next().unwrap().parse::<i64>().unwrap();
                let dt = DateTime {
                    y: n(), mo: n() as u32, d: n() as u32,
                    h: n() as u32, mi: n() as u32, s: n() as u32,
                    off_min: n() as i32,
                };
                let prec = n();
                let cal = n() as u32;
                match convert_time(
                    YagoTerm::DateTimeLiteral(dt),
                    YagoTerm::IntegerLiteral(prec),
                    YagoTerm::WikidataItem(cal),
                ) {
                    Some(YagoTerm::TypedLiteral(v, dt)) => {
                        format!("{}\t{}", v, dt)
                    }
                    Some(YagoTerm::DateTimeLiteral(t)) => format!(
                        "{}\thttp://www.w3.org/2001/XMLSchema#dateTime",
                        t.to_rfc3339()
                    ),
                    Some(t) => format!("OTHER:{}", t),
                    None => "NONE".to_owned(),
                }
            }
            "ntesc" => {
                // hex-decoded UTF-8 in, N-Triples-escaped literal body
                // out. This 4-arm match IS the N-Triples spec escape set
                // that rio's Literal Display implements (model.rs:241).
                let bytes: Vec<u8> = (0..rest.len() / 2)
                    .map(|i| u8::from_str_radix(&rest[2 * i..2 * i + 2], 16)
                        .unwrap())
                    .collect();
                let s = String::from_utf8(bytes).unwrap();
                let mut o = String::new();
                for c in s.chars() {
                    match c {
                        '"' => o.push_str("\\\""),
                        '\\' => o.push_str("\\\\"),
                        '\n' => o.push_str("\\n"),
                        '\r' => o.push_str("\\r"),
                        c => o.push(c),
                    }
                }
                o
            }
            _ => panic!("unknown op {}", op),
        };
        writeln!(out, "{}", result).unwrap();
    }
}
"""


def build_harness(workdir: Path | None = None) -> Path:
    """Extract + compile; returns the binary path (cached by source hash)."""
    plan = PLAN_RS.read_text()
    vocab = VOCAB_RS.read_text()
    bodies = "\n\n".join(_extract_fn(plan, f) for f in _FNS)
    source = (
        _SHIM
        + _extract_prefixes(vocab)
        + "\n\n// --- REFERENCE BODIES (verbatim from src/plan.rs) ---\n"
        + bodies
        + _MAIN
    )
    digest = hashlib.sha256(source.encode()).hexdigest()[:16]
    workdir = workdir or Path(tempfile.gettempdir()) / "yago4_rust_diff"
    workdir.mkdir(parents=True, exist_ok=True)
    binary = workdir / f"harness-{digest}"
    if binary.exists():
        return binary
    src_file = workdir / f"harness-{digest}.rs"
    src_file.write_text(source)
    rustc = shutil.which("rustc") or "/root/.cargo/bin/rustc"
    subprocess.run(
        [rustc, "-O", "--edition", "2018", "-o", str(binary), str(src_file)],
        check=True, capture_output=True, text=True,
    )
    return binary


def run_harness(binary: Path, lines: list[str]) -> list[str]:
    proc = subprocess.run(
        [str(binary)], input="\n".join(lines) + "\n",
        capture_output=True, text=True, check=True,
    )
    out = proc.stdout.split("\n")
    if out and out[-1] == "":
        out.pop()
    assert len(out) == len(lines), (len(out), len(lines))
    return out


def rustc_available() -> bool:
    return bool(shutil.which("rustc") or Path("/root/.cargo/bin/rustc").exists())


# ---------------------------------------------------------------------------
# corpora (deterministic)
# ---------------------------------------------------------------------------

_UNICODE_EDGES = [
    0x1F, 0x20, 0x7E, 0x7F, 0x80, 0x9F, 0xA0, 0xA1, 0xD7FE, 0xD7FF,
    0xE000, 0xF8FF, 0xF8FF, 0xF900, 0xFDCF, 0xFDD0, 0xFDEF, 0xFDF0,
    0xFFEF, 0xFFF0, 0xFFFD, 0x10000, 0x1F600, 0xEFFFD, 0xEFFFE, 0xF0000,
    0x10FFFF,
]


def _rand_char(rng: random.Random) -> str:
    while True:
        if rng.random() < 0.5:
            cp = rng.choice(_UNICODE_EDGES)
        elif rng.random() < 0.7:
            cp = rng.randrange(0x20, 0x250)
        else:
            cp = rng.randrange(0x20, 0x110000)
        if 0xD800 <= cp <= 0xDFFF or cp in (0x09, 0x0A, 0x0D):
            continue
        return chr(cp)


def iri_corpus(n: int = 4000, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    out = ["Dürst", "Paris Hilton/Bio", "", " ", "a b c", "100%", "%41",
           "Санкт-Петербург", "東京", "naïve café", "a/b?c#d",
           " ­﻿", "\U0001F600\U0001F3FD"]
    for _ in range(n):
        out.append("".join(_rand_char(rng)
                           for _ in range(rng.randrange(0, 24))))
    return out


def f64_corpus(n: int = 6000, seed: int = 11) -> list[float]:
    special = [
        0.0, -0.0, 1.0, -1.0, 0.1, 0.2, 0.3, 2.0 / 3.0, 1e-5, -1e-5,
        1234567890.123456, 5e-324, -5e-324, 2.2250738585072014e-308,
        1.7976931348623157e308, -1.7976931348623157e308,
        float("inf"), float("-inf"), float("nan"),
        9007199254740992.0, 9007199254740994.0, 1e15, 1e16, 1e17,
        123.456e30, 1e-20, 3.141592653589793, 2.718281828459045,
        52.48, 13.37, -89.999999, 0.0002777777777777778,
    ]
    rng = random.Random(seed)
    vals = list(special)
    for _ in range(n):
        bits = rng.getrandbits(64)
        (v,) = struct.unpack("<d", struct.pack("<Q", bits))
        vals.append(v)
    for _ in range(n // 2):
        # "plausible coordinates" regime — the geo IRI hot range
        vals.append(rng.uniform(-180, 180))
    return vals


def geo_corpus(n: int = 3000, seed: int = 13) -> list[tuple[float, float, float]]:
    rng = random.Random(seed)
    precisions = [1e-8, 1e-7, 1e-6, 1e-5, 1e-4, 1e-3, 0.01, 0.1, 1.0,
                  1 / 3600, 1 / 60, 0.5, 10.0, 0.0, -0.1, float("nan")]
    out = []
    for _ in range(n):
        out.append((rng.uniform(-90, 90), rng.uniform(-180, 180),
                    rng.choice(precisions)))
    return out


def caml_corpus(n: int = 3000, seed: int = 17) -> list[str]:
    rng = random.Random(seed)
    out = ["fooBar", "birthDate", "CreativeWork", "ISBN", "HTMLElement",
           "already spaced Word", "İstanbulCity", "ÜberMensch", "ẞharp",
           "ΣigmaΤest", "snake_caseMix", "A", "a", "", "ABC123def",
           "ǅungla", "i̇stanbul"]
    letters = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ 0123456789_ÄäÖöÜüİıΣσßẞ"
    for _ in range(n):
        out.append("".join(rng.choice(letters)
                           for _ in range(rng.randrange(0, 20))))
    return out


def sname_corpus() -> list[str]:
    return [
        "http://schema.org/Person", "http://schema.org/birthDate",
        "http://bioschemas.org/Taxon", "http://www.w3.org/2002/07/owl#Class",
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://www.w3.org/2000/01/rdf-schema#label",
        "http://www.w3.org/2001/XMLSchema#dateTime",
        "http://yago-knowledge.org/resource/Douglas_Adams",
        "http://yago-knowledge.org/value/x",
        "http://unknown.example/x y?q=1#frag", "urn:uuid:1234",
        "http://schema.org/", "",
    ]


def quantity_corpus(seed: int = 19) -> list[tuple[str, int]]:
    rng = random.Random(seed)
    amounts = ["0", "5", "-3", "+7", "2.5", "-0", "007",
               "9223372036854775807", "9223372036854775808",
               "-9223372036854775808", "-9223372036854775809",
               "170141183460469231731687303715884105727",
               "170141183460469231731687303715884105728",
               " 5", "5 ", "", "abc", "1e3", "--4"]
    units = [11574, 7727, 25235, 573, 199, 42, 2]
    out = [(a, u) for a in amounts for u in units]
    for _ in range(500):
        out.append((str(rng.randrange(-10**12, 10**12)), rng.choice(units)))
    return out


# ---------------------------------------------------------------------------
# comparisons
# ---------------------------------------------------------------------------


def time_corpus(n: int = 2500, seed: int = 23) -> list[tuple]:
    """(y, mo, d, h, mi, s, off_min, precision, calendar_qid) over the
    Wikidata dump lexical domain. Negative years, year 0, years >= 10000,
    non-UTC offsets, every precision 0-15, Julian calendar rejections."""
    rng = random.Random(seed)
    greg, julian = 1985727, 1985786
    out = [
        (1952, 3, 11, 0, 0, 0, 0, 11, greg),
        (-427, 1, 1, 0, 0, 0, 0, 9, greg),       # classical antiquity
        (-1, 12, 31, 23, 59, 59, 0, 11, greg),   # year -1 boundary
        (0, 1, 1, 0, 0, 0, 0, 9, greg),          # year zero (proleptic)
        (-9999, 1, 1, 0, 0, 0, 0, 9, greg),
        (9999, 12, 31, 0, 0, 0, 0, 10, greg),
        (10000, 1, 1, 0, 0, 0, 0, 9, greg),      # chrono '+' threshold
        (123456, 6, 15, 0, 0, 0, 0, 14, greg),
        (2020, 2, 29, 12, 30, 45, 90, 14, greg),  # +01:30 offset
        (2020, 2, 29, 12, 30, 45, -330, 14, greg),  # -05:30 offset
        (1066, 10, 14, 0, 0, 0, 0, 11, julian),  # julian → dropped
        (2001, 1, 1, 0, 0, 0, 0, 12, greg),      # unsupported precision
    ]
    for _ in range(n):
        y = rng.choice([rng.randrange(-9999, 10000),
                        rng.randrange(-200000, 200000),
                        rng.randrange(1000, 2100)])
        out.append((
            y, rng.randrange(1, 13), rng.randrange(1, 29),
            rng.randrange(24), rng.randrange(60), rng.randrange(60),
            rng.choice([0, 0, 0, 60, -60, 330, -330, 765]),
            rng.choice([0, 7, 8, 9, 9, 10, 10, 11, 11, 12, 13, 14, 14, 15]),
            rng.choice([greg, greg, greg, julian]),
        ))
    return out


def _time_lexical(y: int, mo: int, d: int, h: int, mi: int, s: int,
                  off_min: int) -> str:
    """Dump-canonical RFC3339 lexical: |year| zero-padded to 4 with sign,
    UTC as 'Z', other offsets as ±HH:MM."""
    ys = f"-{-y:04d}" if y < 0 else f"{y:04d}"
    if off_min == 0:
        off = "Z"
    else:
        sign, a = ("-", -off_min) if off_min < 0 else ("+", off_min)
        off = f"{sign}{a // 60:02d}:{a % 60:02d}"
    return f"{ys}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{s:02d}{off}"


def nt_corpus(n: int = 4000, seed: int = 29) -> list[str]:
    """Adversarial literal bodies for the NT escape family: the 4 escape
    chars alone / doubled / interleaved, other C0 controls (NOT escaped
    by the spec), tabs, unicode, long backslash runs."""
    rng = random.Random(seed)
    out = ['', '"', '\\', '\n', '\r', '\t', '\\\\', '\\"', '"\\"',
           'a"b\\c\nd\re\tf', '\\n', '\\r', '""""', "\r\n" * 3,
           "\x00\x01\x1f\x7f", "café 東京 \U0001F600",
           "\\" * 17, 'ends with backslash\\', '"starts with quote',
           "line1\nline2\rline3"]
    chars = list('abc"\\\n\r\t é中') + [chr(c) for c in range(1, 32)]
    for _ in range(n):
        out.append("".join(rng.choice(chars)
                           for _ in range(rng.randrange(0, 30))))
    return out


def _hex(v: float) -> str:
    return format(struct.unpack("<Q", struct.pack("<d", v))[0], "x")


def compare_all(binary: Path) -> dict:
    """Run every corpus; returns {family: {"n": int, "mismatches": [...]}}."""
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from yago4_spark.functions.iri import encode_iri_path_py
    from yago4_spark.functions.names import (camel_case_to_regular,
                                             string_name)
    from yago4_spark.functions.values import round_degrees
    from yago4_spark.terms import format_f64

    report: dict = {}

    def check(family, inputs, lines, mine):
        got = run_harness(binary, lines)
        mm = [
            {"input": repr(i), "rust": r, "python": m}
            for i, r, m in zip(inputs, got, mine) if r != m
        ]
        report[family] = {"n": len(lines), "mismatches": mm[:20],
                          "mismatch_count": len(mm)}

    c = iri_corpus()
    check("encode_iri_path", c, [f"iri\t{s}" for s in c],
          [encode_iri_path_py(s) for s in c])

    f = f64_corpus()
    check("f64_display", f, [f"f64\t{_hex(v)}" for v in f],
          [format_f64(v) for v in f])

    g = geo_corpus()
    check("geo_iri", g,
          [f"geo\t{_hex(a)}\t{_hex(b)}\t{_hex(p)}" for a, b, p in g],
          [f"geo:{format_f64(round_degrees(a, p))},"
           f"{format_f64(round_degrees(b, p))}" for a, b, p in g])

    cc = caml_corpus()
    check("caml_case", cc, [f"caml\t{s}" for s in cc],
          [camel_case_to_regular(s) for s in cc])

    sn = sname_corpus()
    check("string_name", sn, [f"sname\t{s}" for s in sn],
          [string_name(s) for s in sn])

    from yago4_spark.functions.values import (duration_py, integer_quantity_py)
    q = quantity_corpus()
    check("duration", q, [f"dur\t{a}\t{u}" for a, u in q],
          [duration_py(a, u) for a, u in q])
    check("integer_quantity", q, [f"intq\t{a}\t{u}" for a, u in q],
          [integer_quantity_py(a, u) for a, u in q])

    from yago4_spark.functions.values import convert_time_py
    t = time_corpus()
    check("convert_time", t,
          ["ctime\t" + "\t".join(str(x) for x in row) for row in t],
          ["NONE" if (r := convert_time_py(
              _time_lexical(*row[:7]), row[7], row[8])) is None
           else f"{r[0]}\t{r[1]}" for row in t])

    from yago4_spark.terms import escape_nt_py
    ntc = nt_corpus()
    check("nt_escape", ntc,
          ["ntesc\t" + s.encode("utf-8").hex() for s in ntc],
          [escape_nt_py(s) for s in ntc])

    return report


def main() -> int:
    if not rustc_available():
        print("rustc not available", file=sys.stderr)
        return 2
    binary = build_harness()
    report = compare_all(binary)
    total = sum(r["n"] for r in report.values())
    bad = sum(r["mismatch_count"] for r in report.values())
    print(json.dumps({"total_cases": total, "total_mismatches": bad,
                      "families": report}, indent=2, ensure_ascii=False))
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
