"""Hierarchical identifier query — the C-FIND query path (SURVEY §2.3
P3/P4/P6, §2.4 J3, §3.3).

Reference shape: a C-FIND identifier carries per-level match values (equality,
``*``/``?`` wildcards, datetime ranges) plus return keys; the planner walks
entity levels root→requested, builds parent-child equi-joins
(``DicomDatabaseQueryResponseGenerator.addToJoinClause:300-311``) and WHERE
clauses (``:440-516``), and **requires an exact unique key for every level
above the requested one** (``:519-531`` — P6's gating, enforced here at
analysis time before any job runs).

Spark-first shape: the identifier compiles to one DataFrame expression —
filter pushdown and join strategy (broadcast vs sort-merge) are Catalyst's
job; the hierarchical walk is just a join chain.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nifi_dicom_spark.operators.match import datetime_range_match, wildcard_match


@dataclass
class Level:
    """One entity level (Patient→Study→Series→Instance analog)."""

    name: str
    df: DataFrame
    unique_key: str
    #: column in THIS level referencing the parent's unique_key
    parent_ref: str | None = None


def _is_datetime_range(spec: str) -> bool:
    import re

    from nifi_dicom_spark.operators.match import _RANGE_RE, _VALUE_RE

    s = spec.strip()
    if ".." in s or _RANGE_RE.fullmatch(s):
        return True
    # open-ended: a lone datetime value with a leading/trailing dash
    if s.startswith("-") and re.fullmatch(_VALUE_RE, s[1:].strip()):
        return True
    if s.endswith("-") and re.fullmatch(_VALUE_RE, s[:-1].strip()):
        return True
    return False


def compile_match(col: str, spec: object) -> Column:
    """One identifier value → predicate: datetime ranges (``a..b`` / ``a-b``
    / open-ended), DICOM wildcards (``*``/``?``), else equality (P3/P4)."""
    if isinstance(spec, str):
        if _is_datetime_range(spec):
            return datetime_range_match(col, spec)
        return wildcard_match(col, spec)
    return F.col(col) == F.lit(spec)


def _is_exact(spec: object) -> bool:
    if not isinstance(spec, str):
        return True
    return not ("*" in spec or "?" in spec or _is_datetime_range(spec))


def hierarchical_query(
    levels: list[Level],
    target: str,
    filters: dict[str, dict[str, object]],
    return_cols: list[str],
    relational: bool = False,
) -> DataFrame:
    """Run an identifier query at ``target`` level.

    ``levels`` is ordered root→leaf; ``filters[level.name]`` maps columns to
    match specs. Validation (before any Spark job):

    * ``target`` must be a declared level;
    * unless ``relational`` (the reference's relational-query mode,
      ``performQuery(sopClass, identifier, relational)``), every level ABOVE
      the target must filter its ``unique_key`` with an EXACT value (P6) —
      wildcards/ranges there raise ``ValueError``;
    * filter columns must exist in their level's schema (P7 analog).
    """
    names = [lv.name for lv in levels]
    if target not in names:
        raise ValueError(f"unknown query level {target!r}; declared: {names}")
    depth = names.index(target)

    # every filter key must name a declared level at or above the target —
    # the reference planner rejects unknown/below-level identifier keys
    # rather than silently returning a superset
    for fname in filters:
        if fname not in names:
            raise ValueError(
                f"filter references unknown level {fname!r}; declared: {names}"
            )
        if names.index(fname) > depth:
            raise ValueError(
                f"filter level {fname!r} is below the query level {target!r}"
            )

    for i, lv in enumerate(levels[: depth + 1]):
        fl = filters.get(lv.name, {})
        for c in fl:
            if c not in lv.df.columns:
                raise ValueError(f"level {lv.name!r} has no column {c!r}")
        if i < depth and not relational:  # ancestor: unique key pinned exactly
            spec = fl.get(lv.unique_key)
            if spec is None or not _is_exact(spec):
                raise ValueError(
                    f"level {lv.name!r} above query level {target!r} requires "
                    f"an exact {lv.unique_key!r} filter (got {spec!r})"
                )

    out: DataFrame | None = None
    for lv in levels[: depth + 1]:
        df = lv.df
        for c, spec in filters.get(lv.name, {}).items():
            df = df.filter(compile_match(c, spec))
        if out is None:
            out = df
        else:
            parent = levels[names.index(lv.name) - 1]
            out = df.join(
                out, F.col(lv.parent_ref) == F.col(parent.unique_key), "inner"
            )
    return out.select(*return_cols)
