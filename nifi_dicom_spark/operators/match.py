"""Query-matching predicates (SURVEY §2.3 P3/P4, §3.3).

The reference's C-FIND matcher builds SQL WHERE clauses from a filter
identifier: equality + DICOM wildcard match
(``DicomDatabaseQueryResponseGenerator.addToMatchClause``,
``DicomDatabaseQueryResponseGenerator.java:313-340``) and date/time range
match (``DateTimeRangeMatch.java:65-133,277-303``). Spark-first shape: these
become Column predicates that Catalyst pushes down to the parquet/lake scan —
no query-string assembly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# sentinels for open-ended ranges (DateTimeRangeMatch.java fills open ends
# with 1900…/2099… bounds)
_RANGE_MIN = "1900-01-01 00:00:00"
_RANGE_MAX = "2099-12-31 23:59:59.999999"


def wildcard_to_like(pattern: str) -> str:
    """DICOM wildcards ``*``/``?`` → SQL LIKE ``%``/``_``, escaping literal
    ``%``/``_`` (addToMatchClause's translation, ``:322-333``)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def wildcard_match(col: str | Column, pattern: str) -> Column:
    """Equality when the pattern has no wildcards (cheaper: allows pushdown
    as an equality filter), LIKE otherwise — mirroring the reference's
    two-arm clause builder."""
    c = F.col(col) if isinstance(col, str) else col
    if "*" not in pattern and "?" not in pattern:
        return c == pattern
    return c.like(wildcard_to_like(pattern))


def parse_datetime_range(spec: str) -> tuple[str, str]:
    """``"a-b"`` / ``"a-"`` / ``"-b"`` / ``"a"`` → [lower, upper] with open
    ends filled by sentinels (``DateTimeRangeMatch.java:65-133``).

    Accepts ISO-ish date or datetime strings; a bare date upper bound is
    extended to end-of-day (the reference combines date+time pairs into one
    timestamp range).
    """
    spec = spec.strip()
    if "--" in spec:
        raise ValueError(f"malformed range {spec!r}")
    # split on the dash BETWEEN two date parts: a date itself contains '-'
    # only in ISO form, so ranges use ' - ' or a single '-' between full
    # values; we accept 'a..b' too for unambiguous ISO datetimes
    if ".." in spec:
        lo, _, hi = spec.partition("..")
    elif spec.startswith("-"):
        lo, hi = "", spec[1:]
    elif spec.endswith("-"):
        lo, hi = spec[:-1], ""
    elif " - " in spec:
        lo, _, hi = spec.partition(" - ")
    else:
        lo, hi = spec, spec  # single value: exact day/instant
    lo = lo.strip() or _RANGE_MIN
    hi = hi.strip() or _RANGE_MAX
    if len(hi) == 10:  # bare date upper bound → end of day
        hi = hi + " 23:59:59.999999"
    if len(lo) == 10:
        lo = lo + " 00:00:00"
    return lo, hi


def datetime_range_match(col: str | Column, spec: str) -> Column:
    """``col BETWEEN lo AND hi`` on proper TimestampType — pushdown-friendly."""
    c = F.col(col) if isinstance(col, str) else col
    lo, hi = parse_datetime_range(spec)
    return c.between(F.lit(lo).cast("timestamp"), F.lit(hi).cast("timestamp"))
