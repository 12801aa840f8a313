"""Text-analysis functions for training-data pipelines.

All built-in column expressions (JVM-side, codegen'd) - language ID,
quality scoring, token counting, fingerprinting. Each has an exact
ANSI-SQL equivalent used by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from clickhouse_metrics_pipeline_spark.operators.dedup import normalize_text, tokens

# Tiny deterministic stopword lists for the language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "dans"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["was", "on", "as", "with", "be", "at", "by"]

# BPE-ish pretokenizer: letter runs, digit runs, single punctuation marks.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    """Count of BPE-style pretokens (letters / digits / punct marks)."""
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(t, F.lit(BPE_TOKEN_RE))


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    w = tokens(text)
    hits = F.size(F.filter(w, lambda x: x.isin(*sw)))
    return hits.cast("double") / F.greatest(F.size(w), F.lit(1)).cast("double")


def punct_ratio(text: Column | str) -> Column:
    t = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(t, F.lit(r"[^A-Za-z0-9\s]")).cast("double") / F.greatest(
        F.length(t), F.lit(1)
    ).cast("double")


def mean_token_length(text: Column | str) -> Column:
    w = tokens(text)
    return F.aggregate(
        w, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    ).cast("double") / F.greatest(F.size(w), F.lit(1)).cast("double")


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + mean token length
    band + low punctuation + some stopwords. Deterministic, documented,
    SQL-portable (weights sum to 1)."""
    t = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(t)
    len_ok = (n_tok >= 10) & (n_tok <= 100_000)
    mtl = mean_token_length(t)
    mtl_ok = (mtl >= 3.0) & (mtl <= 12.0)
    punct_ok = punct_ratio(t) <= 0.2
    sw_ok = stopword_ratio(t) >= 0.01
    return (
        len_ok.cast("double") * 0.3
        + mtl_ok.cast("double") * 0.3
        + punct_ok.cast("double") * 0.2
        + sw_ok.cast("double") * 0.2
    )


def lang_marker_hits(text: Column | str, lang: str) -> Column:
    return F.size(F.filter(tokens(text), lambda x: x.isin(*LANG_MARKERS[lang])))


def detect_language(text: Column | str) -> Column:
    """Argmax of marker-word hits with deterministic tie-break
    (en > de > es > fr); 'und' (undetermined) when no marker hits."""
    t = F.col(text) if isinstance(text, str) else text
    hits = {lang: lang_marker_hits(t, lang) for lang in LANG_MARKERS}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # reversed so earlier languages win ties in the final when-chain
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when(hits[lang] == best, F.lit(lang)).otherwise(out)
    return F.when(best > 0, out).otherwise(F.lit("und"))


def text_chunks(text: Column | str, chunk: int = 32, stride: int = 24) -> Column:
    """Fixed-size token windows with overlap (chunk - stride tokens),
    space-rejoined - the row-local context-window chunking primitive
    (ARRAY<STRING>, one element per window; a short document yields one
    short chunk). Pure JVM expressions: chunking is a map at any scale."""
    w = tokens(text)
    kmax = F.greatest(
        F.lit(0), F.floor((F.size(w) - F.lit(chunk - stride + 1)) / F.lit(stride))
    )
    return F.transform(
        F.sequence(F.lit(0), kmax),
        lambda k: F.array_join(F.slice(w, k * stride + 1, chunk), " "),
    )


def doc_fingerprint(text: Column | str) -> Column:
    """md5 of normalized text - the portable exact-dedup key."""
    return F.md5(normalize_text(text))


def rolling_hash_fingerprint(text: Column | str, window: int = 8) -> Column:
    """Winnowing-style document fingerprint: min of rolling window hashes
    over the token stream (robust to local edits, row-local)."""
    w = tokens(text)
    window_hashes = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - window, F.lit(0))),
        lambda i: F.xxhash64(F.array_join(F.slice(w, i + 1, window), " ")),
    )
    return F.array_min(window_hashes)
