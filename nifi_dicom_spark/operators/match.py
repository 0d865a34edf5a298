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

import re

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


#: one date/datetime value: compact DICOM (yyyymmdd[hhmmss[.f]]) or ISO
_VALUE_RE = r"(?:\d{8}(?:\d{2}){0,3}(?:\.\d+)?|\d{4}-\d{2}-\d{2}(?:[ T][0-9:.]+)?)"
_RANGE_RE = re.compile(rf"({_VALUE_RE})\s*-\s*({_VALUE_RE})$")


def _normalize_dt(v: str) -> str:
    """Compact DICOM ``yyyymmdd[hh[mm[ss[.f]]]]`` → ``'yyyy-mm-dd hh:mm:ss.f'``
    (the reference's ``convertToSQLTimestampFormat``,
    ``DateTimeRangeMatch.java:28-63``); ISO strings pass through."""
    if not v.isascii() or "-" in v or ":" in v:
        return v
    head, _, frac = v.partition(".")
    if not head.isdigit() or len(head) < 8:
        return v
    out = f"{head[0:4]}-{head[4:6]}-{head[6:8]}"
    hh = head[8:10] or "00"
    mm = head[10:12] or "00"
    ss = head[12:14] or "00"
    if len(head) > 8 or frac:
        out += f" {hh}:{mm}:{ss}"
        if frac:
            out += f".{frac}"
    return out


def parse_datetime_range(spec: str) -> tuple[str, str]:
    """``"a-b"`` / ``"a-"`` / ``"-b"`` / ``"a"`` → [lower, upper] with open
    ends filled by sentinels (``DateTimeRangeMatch.java:65-133``).

    Accepts compact DICOM values (``20240101-20240201``) and ISO date or
    datetime strings — including the ambiguous ISO ``a-b`` form
    (``2024-01-01-2024-02-01``), matched structurally; ``a..b`` and
    ``a - b`` also work. A bare date upper bound extends to end-of-day (the
    reference combines date+time pairs into one timestamp range).
    """
    spec = spec.strip()
    if ".." in spec:
        lo, _, hi = spec.partition("..")
    elif " - " in spec:
        lo, _, hi = spec.partition(" - ")
    elif m := _RANGE_RE.fullmatch(spec):
        lo, hi = m.group(1), m.group(2)
    elif spec.startswith("-"):
        lo, hi = "", spec[1:]
    elif spec.endswith("-"):
        lo, hi = spec[:-1], ""
    else:
        lo, hi = spec, spec  # single value: exact day/instant
    lo, hi = _normalize_dt(lo.strip()), _normalize_dt(hi.strip())
    if not re.fullmatch(rf"{_VALUE_RE}|", lo) or not re.fullmatch(
        rf"{_VALUE_RE}|", hi
    ):
        raise ValueError(f"malformed datetime range {spec!r}")
    lo = lo or _RANGE_MIN
    hi = hi or _RANGE_MAX
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
