"""Text-analysis operators for training-data pipelines.

All expressions are Catalyst-native (JVM, codegen) — no UDFs — so they
push down/columnar-scan cleanly at 100 TB. Each has an exact ANSI-SQL
equivalent used by the DuckDB oracle in __spark_entry__.py.

Components: token counting (whitespace + BPE-ish regex), language id
(stopword-marker heuristic), quality scoring (length/punct/stopword
ratios), document fingerprinting (md5 + rolling polynomial hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker sets for the n-gram/stopword heuristic. The
# point is the *operator shape* (vectorized scoring + deterministic
# argmax), not linguistic quality.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans"],
    "es": ["el", "la", "los", "es", "un", "una", "que", "en"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "for", "on", "with", "as", "was", "are"]

# BPE-ish tokenization: letter runs, digit runs, or single non-space
# symbols — a regex approximation of byte-pair pretokenization.
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/null)."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("int")


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish pretokens (letters / digits / symbol singletons)."""
    return F.regexp_count(F.coalesce(text, F.lit("")), F.lit(BPE_ISH_PATTERN)).cast("int")


def _marker_hits(text: Column, markers: list[str]) -> Column:
    words = F.split(F.lower(F.coalesce(text, F.lit(""))), r"[^\p{L}\p{N}]+")
    return F.size(F.array_intersect(words, F.array(*[F.lit(m) for m in markers])))


def lang_id(text: Column, langs: list[str] | None = None) -> Column:
    """Heuristic language id: argmax of distinct marker-word hits, with a
    deterministic tie-break (first language in declaration order wins);
    'und' (undetermined) when no marker hits at all."""
    langs = langs or list(LANG_MARKERS)
    scored = F.array(
        *[
            F.struct(
                _marker_hits(text, LANG_MARKERS[lg]).alias("hits"),
                F.lit(-i).alias("prio"),
                F.lit(lg).alias("lang"),
            )
            for i, lg in enumerate(langs)
        ]
    )
    best = F.array_max(scored)
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Composite [0,1]-ish quality heuristic (length, word shape,
    punctuation density, stopword presence) — the batch analog of
    filter-quality scoring in web-scale corpus cleaning."""
    t = F.coalesce(text, F.lit(""))
    n_chars = F.length(t).cast("double")
    n_tok = ws_token_count(t).cast("double")
    mean_wl = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    n_punct = F.regexp_count(t, F.lit(r"[^\p{L}\p{N}\s]")).cast("double")
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0, _marker_hits(t, STOPWORDS_EN).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    len_component = F.least(n_tok / 100.0, F.lit(1.0))
    wl_component = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), 1.0).otherwise(0.5)
    return F.round(
        0.4 * len_component + 0.2 * wl_component + 0.2 * (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0)))
        + 0.2 * F.least(stop_ratio * 5.0, F.lit(1.0)),
        4,
    )


def md5_fingerprint(text: Column, normalize: bool = True) -> Column:
    """Deterministic 64-bit content fingerprint: first 16 hex chars of
    md5 over whitespace-normalized lowercase text."""
    t = F.coalesce(text, F.lit(""))
    if normalize:
        t = F.regexp_replace(F.lower(t), r"\s+", " ")
    return F.substring(F.md5(t), 1, 16)


def rolling_fingerprint(text: Column, window: int = 8) -> Column:
    """Winnowing-style fingerprint: min over the rolling polynomial
    hashes of each ``window``-gram of words (engine-side only; used for
    near-dup candidate keys). xxhash64 of the joined gram stands in for
    the polynomial — deterministic and JVM-side."""
    words = F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+")
    n = F.size(words)
    grams = F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i + 1, window))),
        ),
    ).otherwise(F.array(F.xxhash64(F.concat_ws(" ", words))))
    return F.array_min(grams)
