"""Text-analysis columns for large-scale training-data pipelines.

All pure built-in expressions (JVM-side, codegen) — the transcript/document
tables at 100 TB never touch Python for these. Cross-engine-deterministic
(same results in DuckDB SQL) so every one is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny multi-language stopword list — deterministic, not linguistic truth
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (empty strings filtered)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def word_tokens(col: str | Column) -> Column:
    """BPE-ish pre-tokenization: split into word / number / punct runs."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)


def stopword_ratio(col: str | Column) -> Column:
    t = tokens(col)
    sw = F.filter(t, lambda x: F.lower(x).isin(STOPWORDS))
    return F.when(F.size(t) > 0, F.size(sw) / F.size(t)).otherwise(F.lit(0.0))


def punct_ratio(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def mean_word_len(col: str | Column) -> Column:
    t = tokens(col)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(t) > 0, total / F.size(t)).otherwise(F.lit(0.0))


def quality_score(col: str | Column) -> Column:
    """Composite quality heuristic in [0,1]: long enough, balanced word
    length, some stopwords, little punctuation noise."""
    n = token_count(col)
    len_ok = F.when(n >= 5, 1.0).otherwise(n / F.lit(5.0))
    mwl = mean_word_len(col)
    wl_ok = F.when((mwl >= 3) & (mwl <= 10), 1.0).otherwise(0.5)
    sw = stopword_ratio(col)
    sw_ok = F.when((sw > 0.0) & (sw < 0.6), 1.0).otherwise(0.5)
    pr_ok = F.when(punct_ratio(col) < 0.2, 1.0).otherwise(0.3)
    return F.round((len_ok + wl_ok + sw_ok + pr_ok) / 4.0, 6)


def fingerprint(col: str | Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lower-cased
    text — exact-dup key robust to spacing (rolling-hash stand-in that stays
    cross-engine deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))


# --- language ID (n-gram heuristic) -----------------------------------------

#: deterministic marker sets per language (toy heuristic — scores by marker
#: hit counts, ties broken alphabetically). Real pipelines plug a model here.
_LANG_MARKERS = {
    "en": ["the", "and", "is"],
    "de": ["der", "und", "ist"],
    "fr": ["le", "et", "est"],
    "es": ["el", "y", "es"],
}


def lang_score(col: str | Column, lang: str) -> Column:
    """Marker-token hit count for one language."""
    lowered = F.transform(tokens(col), F.lower)
    markers = _LANG_MARKERS[lang]
    return F.size(F.filter(lowered, lambda x: x.isin(markers)))


def lang_guess(col: str | Column) -> Column:
    """argmax over marker-token hit counts, alphabetical tie-break;
    'und' (undetermined) when all scores are 0. Expressed as an explicit
    when-chain so the exact same logic is one CASE expression in SQL."""
    scores = {lang: lang_score(col, lang) for lang in sorted(_LANG_MARKERS)}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reverse alphabetical so the earliest language wins ties in the chain
    for lang in sorted(_LANG_MARKERS, reverse=True):
        out = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out
