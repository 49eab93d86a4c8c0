"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Every function is a pure ``pyspark.sql.functions`` column expression
(JVM-side, whole-stage codegen) AND has an exact ANSI-SQL twin in
``__spark_entry__.oracle_sql`` — the formulas below are deliberately
md5/arithmetic-based so DuckDB computes bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword heuristic
# language ID. Deliberately small and inline-able into SQL.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "ich"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que", "pas"],
    "es": ["el", "la", "los", "y", "es", "una", "para", "en", "que", "no"],
}


def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(F.size(tokens(text)))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish proxy: alnum runs + each punctuation char counts as a
    token (regexp-based, the standard cheap estimator)."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9]+|\s+", "")
    words = F.when(F.trim(text) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.regexp_replace(text, r"[^A-Za-z0-9\s]", " ")), r"\s+"))
    )
    return words + F.length(stripped)


def _stopword_hits(text: Column, words: list[str]) -> Column:
    toks = tokens(F.lower(text))
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(toks, arr))


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: _stopword_hits(text, words)
            for lang, words in LANG_PROFILES.items()}


def lang_id(text: Column) -> Column:
    """argmax language by distinct-stopword hits; ties broken by language
    code ascending; 'und' (undetermined) when no profile hits."""
    scores = lang_scores(text)
    m = F.greatest(*scores.values())
    expr = F.lit("und")
    # build the when-chain in reverse so alphabetically-first languages
    # are checked first (deterministic tie-break)
    for lang in sorted(LANG_PROFILES, reverse=True):
        expr = F.when(scores[lang] == m, F.lit(lang)).otherwise(expr)
    return F.when(m == 0, F.lit("und")).otherwise(expr)


def punct_ratio(text: Column) -> Column:
    p = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()\[\]-]", ""))
    return p / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    hits = _stopword_hits(text, LANG_PROFILES["en"])
    return hits / F.greatest(token_count(text), F.lit(1))


def mean_word_length(text: Column) -> Column:
    non_space = F.length(F.regexp_replace(text, r"\s+", ""))
    return non_space / F.greatest(token_count(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band + word-length band +
    punctuation sanity. Deterministic arithmetic, SQL-twin-able."""
    n = token_count(text)
    length_ok = F.when((n >= 10) & (n <= 10000), 1.0).otherwise(0.3)
    mwl = mean_word_length(text)
    word_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.4)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.5)
    return F.round((length_ok * 0.4 + word_ok * 0.4 + punct_ok * 0.2), 6)


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: md5 of whitespace-normalized,
    lowercased text — the exact-dedup key. md5 is bit-identical across
    Spark and DuckDB."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))
