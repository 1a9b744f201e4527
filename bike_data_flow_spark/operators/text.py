"""Text-analysis operators (north-star extension; no reference analog).

All operators are pure Column expressions over built-in functions —
JVM-side, whole-stage-codegen'd, zero Python in the hot path. Each
scales linearly: no shuffle is introduced unless the caller aggregates.

Determinism contract: every function here has an exact ANSI-SQL
mirror (see queries/textops.py) so the DuckDB oracle reproduces it
bit-for-bit — that is why hashes are md5-prefix arithmetic rather than
xxhash64 (Spark-only) or hash() (DuckDB-only).

Perf contract: the ``*_t`` variants take a pre-materialized token
array attribute. Inlining ``tokens(text)`` into several expressions
makes Catalyst duplicate the split per use (measured ~4× slower);
callers on hot paths should project the token array once (see
with_text_stats).
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
    """Share of [a-z] characters after lower-casing (quality signal).
    try_divide: empty text → NULL, matching DuckDB's x/0 (a plain `/`
    throws under Spark 4's default ANSI mode)."""
    low = F.lower(text)
    return F.round(
        F.try_divide(F.length(F.regexp_replace(low, "[^a-z]", "")), F.length(low)),
        4,
    )


# Unicode-aware variants (SURVEY §7.4.1 deviation closed): the ASCII
# [a-z] operators above are pinned to the synthetic English corpus; the
# reference's domain is Wrocław — Polish diacritics (ł ś ż ą ę...) must
# count as letters. \p{L}\p{M} is supported identically by Spark's Java
# regex and DuckDB's RE2, so the oracle reproduces these bit-for-bit.
UNICODE_WORD_PATTERN = "[\\p{L}\\p{M}]+"


def unicode_tokens(text: Column) -> Column:
    """Letter-run tokenization (diacritic-aware) of lower-cased text."""
    return F.regexp_extract_all(
        F.lower(text), F.lit(UNICODE_WORD_PATTERN), F.lit(0)
    )


def unicode_alpha_ratio(text: Column) -> Column:
    """Share of Unicode letter/mark characters (ł counts, unlike
    alpha_ratio's ASCII [a-z]). try_divide: empty text → NULL, like
    DuckDB's x/0."""
    low = F.lower(text)
    return F.round(
        F.try_divide(
            F.length(F.regexp_replace(low, "[^\\p{L}\\p{M}]", "")), F.length(low)
        ),
        4,
    )


def _in_set(markers: tuple[str, ...]):
    # factory, not a default-arg lambda: PySpark introspects the lambda's
    # positional signature to bind higher-order-function variables
    return lambda t: t.isin(*markers)


def stopword_ratio_t(toks: Column) -> Column:
    hits = F.size(F.filter(toks, _in_set(STOPWORDS)))
    return F.round(hits / F.size(toks), 4)


def stopword_ratio(text: Column) -> Column:
    return stopword_ratio_t(tokens(text))


def avg_token_len_t(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total / F.size(toks), 4)


def avg_token_len_fast(text: Column, toks: Column) -> Column:
    """Fold-free equivalent of avg_token_len_t: in the whitespace-collapsed
    normal form, Σ len(tok) = len(normalized) − (n_tokens − 1). Pure
    string/int arithmetic — identical values, no per-element lambda."""
    n = F.size(toks)
    total = F.length(normalized_text(text)) - (n - 1)
    return F.round(total / n, 4)


def avg_token_len(text: Column) -> Column:
    return avg_token_len_t(tokens(text))


def quality_score_parts(a: Column, s: Column, ln: Column) -> Column:
    """Composite quality score in [0,1] from (rounded) alpha ratio,
    stopword ratio, avg token length. Deterministic arithmetic only."""
    len_ok = F.when((ln >= 2.0) & (ln <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((a + F.least(s * 5, F.lit(1.0)) + len_ok) / 3, 4)


def quality_score(text: Column) -> Column:
    return quality_score_parts(
        alpha_ratio(text), stopword_ratio(text), avg_token_len(text)
    )


def lang_scores_t(toks: Column) -> dict[str, Column]:
    """Marker-token hit counts per language (n-gram-heuristic lang ID)."""
    return {
        lang: F.size(F.filter(toks, _in_set(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_scores(text: Column) -> dict[str, Column]:
    return lang_scores_t(tokens(text))


def predicted_lang_scores(s: dict[str, Column]) -> Column:
    """Argmax of lang scores with a fixed priority tie-break (en>es>zh),
    'und' when no marker hits at all."""
    return (
        F.when((s["en"] >= s["es"]) & (s["en"] >= s["zh"]) & (s["en"] > 0), F.lit("en"))
        .when((s["es"] >= s["zh"]) & (s["es"] > 0), F.lit("es"))
        .when(s["zh"] > 0, F.lit("zh"))
        .otherwise(F.lit("und"))
    )


def predicted_lang(text: Column) -> Column:
    return predicted_lang_scores(lang_scores(text))


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed, lower-cased canonical form for fingerprints."""
    return F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (The reference's SHA-256 payload gate, raw_all.py:83, generalized
    to a per-document content fingerprint.)"""
    return F.md5(normalized_text(text))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Convenience: attach the full text-analysis column set.
    Tokenizes once (materialized _toks projection), then derives."""
    c = F.col(text_col)
    staged = df.select("*", tokens(c).alias("_toks"))
    t = F.col("_toks")
    scores = lang_scores_t(t)
    return staged.select(
        *df.columns,
        F.size(t).alias("n_tokens"),
        bpe_ish_count(c).alias("n_bpe_tokens"),
        alpha_ratio(c).alias("alpha_ratio"),
        stopword_ratio_t(t).alias("stopword_ratio"),
        avg_token_len_t(t).alias("avg_token_len"),
        quality_score_parts(
            alpha_ratio(c), stopword_ratio_t(t), avg_token_len_t(t)
        ).alias("quality_score"),
        predicted_lang_scores(scores).alias("predicted_lang"),
        fingerprint(c).alias("fingerprint"),
    )


def chunk_starts(toks: Column, chunk: int, overlap: int) -> Column:
    """1-based start offsets for overlapping token windows: starts at
    1, 1+step, ... while start <= max(1, n_tokens - overlap), where
    step = chunk - overlap. The final window is allowed to run short;
    every token lands in at least one window."""
    step = chunk - overlap
    n = F.size(toks)
    return F.sequence(F.lit(1), F.greatest(F.lit(1), n - overlap), F.lit(step))


def chunk_tokens(toks: Column, start: Column, chunk: int) -> Column:
    """The token window [start, start+chunk) as a space-joined string."""
    return F.concat_ws(" ", F.slice(toks, start, chunk))
