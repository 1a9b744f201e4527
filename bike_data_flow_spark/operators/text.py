"""Text-analysis operators (north-star extension; no reference analog).

All operators are pure Column expressions over built-in functions —
JVM-side, whole-stage-codegen'd, zero Python in the hot path. Each
scales linearly: no shuffle is introduced unless the caller aggregates.

Determinism contract: every function here has an exact ANSI-SQL
mirror (see queries/textops.py) so the DuckDB oracle reproduces it
bit-for-bit — that is why hashes are md5-prefix arithmetic rather than
xxhash64 (Spark-only) or hash() (DuckDB-only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared constants — the SQL oracles are generated from these same tuples.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in"),
    "es": ("el", "la", "de", "y", "que", "en"),
    "zh": ("de", "shi", "le", "bu", "wo", "zai"),
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols.
BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9\\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lower-cased text → array<string>."""
    return F.split(F.lower(F.trim(text)), "\\s+")


def token_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(F.lower(t), "\\s+")))


def bpe_ish_count(text: Column) -> Column:
    """Sub-word-ish token estimate via regex match count."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def alpha_ratio(text: Column) -> Column:
    """Share of [a-z] characters after lower-casing (quality signal)."""
    low = F.lower(text)
    return F.round(
        F.length(F.regexp_replace(low, "[^a-z]", "")) / F.length(low), 4
    )


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return F.round(hits / F.size(toks), 4)


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.size(toks), 4)


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: alpha share, stopword presence,
    reasonable token length. Deterministic arithmetic only."""
    a = alpha_ratio(text)
    s = stopword_ratio(text)
    ln = avg_token_len(text)
    len_ok = F.when((ln >= 2.0) & (ln <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((a + F.least(s * 5, F.lit(1.0)) + len_ok) / 3, 4)


def _in_set(markers: tuple[str, ...]):
    # factory, not a default-arg lambda: PySpark introspects the lambda's
    # positional signature to bind higher-order-function variables
    return lambda t: t.isin(*markers)


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-token hit counts per language (n-gram-heuristic lang ID)."""
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, _in_set(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_lang(text: Column) -> Column:
    """Argmax of lang_scores with a fixed priority tie-break (en>es>zh),
    'und' when no marker hits at all."""
    s = lang_scores(text)
    return (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["zh"]) & (s["en"] > 0), F.lit("en"))
        .when((s["es"] >= s["zh"]) & (s["es"] > 0), F.lit("es"))
        .when(s["zh"] > 0, F.lit("zh"))
        .otherwise(F.lit("und"))
    )


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed, lower-cased canonical form for fingerprints."""
    return F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (The reference's SHA-256 payload gate, raw_all.py:83, generalized
    to a per-document content fingerprint.)"""
    return F.md5(normalized_text(text))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the full text-analysis column set."""
    c = F.col(text_col)
    return df.select(
        "*",
        token_count(c).alias("n_tokens"),
        bpe_ish_count(c).alias("n_bpe_tokens"),
        alpha_ratio(c).alias("alpha_ratio"),
        stopword_ratio(c).alias("stopword_ratio"),
        avg_token_len(c).alias("avg_token_len"),
        quality_score(c).alias("quality_score"),
        predicted_lang(c).alias("predicted_lang"),
        fingerprint(c).alias("fingerprint"),
    )
