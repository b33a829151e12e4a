"""Text-analysis scalar family for LLM-training-data pipelines.

Beyond the reference's surface (required extension, BASELINE.json
"north_star"): language-ID, quality scoring, token counting, document
fingerprinting. All are pure built-in-function column expressions so they
run JVM-side over 100 TB; each has an exact ANSI-SQL twin for the DuckDB
oracle (see plans/queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword sets; tie order en > fr > de > es is part of
# the deterministic contract.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "it", "a"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "es": ("el", "los", "de", "y", "que", "en", "un", "es"),
}

PUNCT_CLASS = r"[.,!?;:]"


def _col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty/null text → empty array."""
    t = F.trim(F.coalesce(_col(col), F.lit("")))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("bigint")


def _stopword_hits(toks: Column, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(toks, lambda x: F.lower(x).isin(*words)))


def language_id(col: Column | str) -> Column:
    """Stopword-vote language ID: argmax of per-language stopword hits,
    deterministic tie order en>fr>de>es, zero hits → 'und'."""
    toks = tokens(col)
    en, fr, de, es = (_stopword_hits(toks, lang) for lang in ("en", "fr", "de", "es"))
    best = F.greatest(en, fr, de, es)
    return (
        F.when(best == 0, "und")
        .when(en == best, "en")
        .when(fr == best, "fr")
        .when(de == best, "de")
        .otherwise("es")
    )


def quality_score_components(col: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword quality features.

    Ratios are single double divisions of exact integer counts →
    bit-identical across engines.
    """
    t = F.coalesce(_col(col), F.lit(""))
    toks = tokens(col)
    n_chars = F.length(t).cast("bigint")
    n_tokens = F.size(toks).cast("bigint")
    n_punct = (
        n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    ).cast("bigint")
    n_stop = _stopword_hits(toks, "en").cast("bigint")
    denom_c = F.greatest(n_chars, F.lit(1)).cast("double")
    denom_t = F.greatest(n_tokens, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (n_chars - (n_tokens - 1)) / denom_t,
        "punct_ratio": n_punct / denom_c,
        "stopword_ratio": n_stop / denom_t,
    }


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprint/dedup: lowercase, strip punctuation,
    collapse whitespace."""
    t = F.lower(F.coalesce(_col(col), F.lit("")))
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return t


def doc_fingerprint(col: Column | str) -> Column:
    """md5 of the normalized text — exact-dup key after normalization."""
    return F.md5(normalize_text(col))


def rolling_hash(col: Column | str, mod: int = 2147483647, base: int = 31) -> Column:
    """Polynomial rolling hash over characters (library fingerprint for
    shingling; no SQL oracle — verified against a Python twin in tests)."""
    chars = F.split(F.coalesce(_col(col), F.lit("")), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )
