"""PII detection + redaction over transcript/document text.

The reference engine's entire purpose is deidentification of PHI before
data leaves the enclave (``DeidentifyDICOM.java``, attribute-level rules in
``DeidentificationService.java``); this module is the free-text analogue a
training-data pipeline needs: structured identifiers (emails, phone
numbers, SSNs, card numbers, IPv4 addresses) detected and replaced with
typed placeholder tokens before the text reaches a corpus shard.

Scale shape: pure built-in ``regexp_replace`` / ``regexp_count`` column
expressions — JVM-side, whole-stage codegen, zero shuffle, no Python in
the hot path. The patterns are written in the common subset of Java
``util.regex`` and RE2 syntax (no lookaround, no backreferences) so every
stage replays exactly in the DuckDB oracle.

Redaction is SEQUENTIAL in declaration order: each pattern runs over the
output of the previous one. Order is part of the contract — e.g. emails are
consumed before phone-like digit runs can match their local parts — and the
oracle applies the same order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (kind, pattern, replacement) — order matters, see module docstring.
# Patterns use only syntax valid in BOTH Java regex and RE2 (DuckDB).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # SSN (3-2-4) before phone so the 9-digit grouping is not half-eaten
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "[SSN]"),
    # 16-digit card in 4-4-4-4 grouping (space or dash separated)
    ("card", r"\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\b", "[CARD]"),
    # NANP-ish phone: '(415) 555-0123' / '(415)555-0123' or bare 3-3-4 with
    # -/./space separators ('415-555-0123', '415.555.0123', '415 555 0123')
    (
        "phone",
        r"(\([0-9]{3}\) ?|\b[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}\b",
        "[PHONE]",
    ),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
]

_KINDS = [k for k, _, _ in PII_PATTERNS]


def redact(col: str | Column, kinds: list[str] | None = None) -> Column:
    """Sequentially replace every PII match with its typed placeholder.

    ``kinds`` restricts to a subset (declaration order is preserved
    regardless of the order given).
    """
    c = F.col(col) if isinstance(col, str) else col
    wanted = set(_KINDS if kinds is None else kinds)
    unknown = wanted - set(_KINDS)
    if unknown:
        raise ValueError(f"unknown PII kinds: {sorted(unknown)}; have {_KINDS}")
    for kind, pat, repl in PII_PATTERNS:
        if kind in wanted:
            c = F.regexp_replace(c, pat, repl)
    return c


def pii_count(col: str | Column, kind: str) -> Column:
    """Match count for one PII kind over the ORIGINAL text (counts are
    independent per kind; redaction order does not affect them)."""
    c = F.col(col) if isinstance(col, str) else col
    for k, pat, _ in PII_PATTERNS:
        if k == kind:
            return F.regexp_count(c, F.lit(pat))
    raise ValueError(f"unknown PII kind {kind!r}; have {_KINDS}")


def pii_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-row redacted text + per-kind counts + a has_pii flag.

    One narrow projection, no shuffle; at 100 TB this pipelines with the
    parquet scan (predicate/column pruning intact).
    """
    counts = [
        pii_count(text_col, k).cast("long").alias(f"n_{k}") for k in _KINDS
    ]
    out = df.select(
        F.col(id_col),
        redact(text_col).alias("redacted"),
        *counts,
    )
    total = sum(F.col(f"n_{k}") for k in _KINDS)
    return out.withColumn("has_pii", total > F.lit(0))


def oracle_sql_fragments() -> tuple[str, list[tuple[str, str]]]:
    """DuckDB equivalents: (redaction expression template, per-kind count
    expressions). The redaction template nests ``regexp_replace(..., 'g')``
    in the same declaration order."""
    # DuckDB standard string literals are not backslash-processed, so the
    # Java-side pattern text passes through verbatim; only quotes need care.
    expr = "{col}"
    for _, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    counts = []
    for kind, pat, _ in PII_PATTERNS:
        p = pat.replace("'", "''")
        counts.append((kind, f"len(regexp_extract_all({{col}}, '{p}'))"))
    return expr, counts
