"""Person-name fuzzy matching — the C-FIND PN attribute match (SURVEY §2.3 P5).

Reference: ``DicomDatabaseQueryResponseGenerator`` matches person names with
an OR-block over (a) the canonical form, (b) a phonetic form, and (c)
component-swapped variants, all probed against **search columns precomputed
at write time** (``DicomDatabaseQueryResponseGenerator.java:456-512``; the
derived ``PM_`` columns are created on insert,
``DatabaseInformationModel.java:590-610``).

Spark-first shape — normalize-at-write: :func:`add_search_columns` derives
``pm_canonical`` / ``pm_phonetic`` / ``pm_swapped`` columns once at write
time (plain ``withColumn`` expressions, whole-stage codegen); probing is
then ONE broadcast equi-join over exploded (target-column, key) entries —
every match mode resolves by hash lookup in a single scan of the record
side, never a per-row fuzzy scan. The phonetic key is a deterministic soundex-style consonant skeleton
built only from ``upper``/``regexp_replace``/``translate`` so it is exactly
reproducible in any SQL engine (DuckDB oracle); classic soundex needs
adjacent-duplicate collapsing (regex backreferences) which RE2-based engines
lack.

Name model: DICOM PN components separated by ``^`` (family^given^middle...),
``PersonNameAttribute`` semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: soundex-style consonant classes (B/F/P/V→1, C/G/J/K/Q/S/X/Z→2, D/T→3,
#: L→4, M/N→5, R→6); vowels + H/W/Y dropped from the tail, digits kept
_CONS = "BFPVCGJKQSXZDTLMNR"
_CODE = "111122222222334556"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def canonical_name(col: str | Column) -> Column:
    """Lower-cased, stripped of everything but letters/digits/``^``."""
    return F.lower(F.regexp_replace(_c(col).cast("string"), "[^A-Za-z0-9^]", ""))


def phonetic_key(col: str | Column) -> Column:
    """Deterministic phonetic skeleton: first character + consonant-class
    digits of the rest (vowels/H/W/Y removed), digits preserved."""
    up = F.upper(F.regexp_replace(_c(col).cast("string"), "[^A-Za-z0-9]", ""))
    first = F.substring(up, 1, 1)
    rest = F.regexp_replace(F.substring(up, 2, 2_000_000), "[AEIOUYHW]", "")
    return F.concat(first, F.translate(rest, _CONS, _CODE))


def swapped_name(col: str | Column) -> Column:
    """Canonical form with the first two ``^`` components (family, given)
    swapped; further components are dropped from the swap variant (they
    don't participate in the reference's swap probe either); names without
    a ``^`` swap to themselves."""
    canon = canonical_name(col)
    parts = F.split(canon, r"\^")
    return F.when(
        F.size(parts) >= 2,
        F.concat_ws("^", F.element_at(parts, 2), F.element_at(parts, 1)),
    ).otherwise(canon)


def add_search_columns(df: DataFrame, name_col: str) -> DataFrame:
    """Normalize-at-write: derive the three search columns the probe matches
    against (the ``PM_`` columns of ``DatabaseInformationModel.java:590-610``)."""
    return (
        df.withColumn("pm_canonical", canonical_name(name_col))
        .withColumn("pm_phonetic", phonetic_key(name_col))
        .withColumn("pm_swapped", swapped_name(name_col))
    )


def person_name_match(
    records: DataFrame, probes: DataFrame, probe_col: str = "probe"
) -> DataFrame:
    """Match probe names against precomputed search columns.

    ``records`` must carry ``pm_canonical``/``pm_phonetic``/``pm_swapped``
    (see :func:`add_search_columns`). Returns one row per (probe, record,
    match_mode) — the reference's OR-block expressed as ONE broadcast hash
    join: each probe explodes into its (key, target-column, mode) arms
    (canonical→pm_canonical, phonetic→pm_phonetic, swap→pm_canonical), each
    record explodes into its two (target-column, value) search entries, and
    the join key is (target, value). One scan of the record side however
    many match modes exist — the OR-predicate formulation would force a
    nested-loop join, and a union-of-joins would scan the records once per
    mode. Probe sets are small by construction (a query identifier), so the
    probe side broadcasts."""
    # internal prefixed names so a records column named key/target/mode can
    # never collide with the join plumbing
    arms = F.array(
        F.struct(
            F.lit("canonical").alias("_pm_mode"),
            F.lit("canon").alias("_pm_target"),
            canonical_name(probe_col).alias("_pm_key"),
        ),
        F.struct(
            F.lit("phonetic").alias("_pm_mode"),
            F.lit("phon").alias("_pm_target"),
            phonetic_key(probe_col).alias("_pm_key"),
        ),
        F.struct(
            F.lit("swap").alias("_pm_mode"),
            F.lit("canon").alias("_pm_target"),
            swapped_name(probe_col).alias("_pm_key"),
        ),
    )
    p = probes.select(
        _c(probe_col).alias("probe"), F.explode(arms).alias("_pm_arm")
    ).select("probe", "_pm_arm._pm_mode", "_pm_arm._pm_target", "_pm_arm._pm_key")
    entries = F.array(
        F.struct(
            F.lit("canon").alias("_pm_target"),
            F.col("pm_canonical").alias("_pm_key"),
        ),
        F.struct(
            F.lit("phon").alias("_pm_target"),
            F.col("pm_phonetic").alias("_pm_key"),
        ),
    )
    r = records.select(*records.columns, F.explode(entries).alias("_pm_e")).select(
        *records.columns, "_pm_e._pm_target", "_pm_e._pm_key"
    )
    return r.join(
        F.broadcast(p), on=["_pm_target", "_pm_key"], how="inner"
    ).select("probe", *records.columns, F.col("_pm_mode").alias("match_mode"))
