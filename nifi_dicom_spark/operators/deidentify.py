"""Deidentification transform — identity-dimension join + deterministic
pseudo-identity + rule-driven column hygiene (SURVEY §2.4 J1, §2.8 F1-F5/F12).

Reference semantics re-expressed Spark-first:

* ``DeidentifyDICOM`` probes a CSV-loaded identity map by PatientID
  (``DeidentifyDICOM.java:216-234``) — here a **broadcast hash join** against
  a small dimension DataFrame;
* a miss either routes ``not_matched`` (anti-join) or synthesizes a
  deterministic pseudo-identity
  (``IdentityEntry.createPseudoEntry``, ``IdentityEntry.java:28-41``:
  name = ``"Anonymous^" + MD5(id)[0:10]`` upper-cased,
  id = ``MD5(id ∥ "PatientId")``) — here ``F.when(dim.isNull, md5_fallback)``;
* accession remap ``BigInteger(MD5(...)).toString()[0:16]``
  (``IdentityEntry.generateAccessionNumber:75-81``) — decimal digits of the
  hash;
* rule-driven remove / null-out / replace-with-constant
  (``ClinicalTrialsAttributes.removeOrNullIdentifyingAttributesRecursively``,
  ``ClinicalTrialsAttributes.java:2528+``) — ``drop`` / ``F.lit`` /
  ``F.when`` column rules, plus an audit column appended
  (``F.array_union`` ≙ DeidentificationMethod audit trail, ``:2410-2482``).

Everything is built-in expressions — whole-stage codegen, zero Python in the
hot path.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pseudo_name(col: str | Column) -> Column:
    """``Anonymous^`` + first 10 hex chars of MD5, upper-cased (F2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit("Anonymous^"), F.upper(F.substring(F.md5(c), 1, 10)))


def pseudo_id(col: str | Column, salt: str = "PatientId") -> Column:
    """MD5(id ∥ salt) upper-cased (F2)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.md5(F.concat(c.cast("string"), F.lit(salt))))


def remap_accession(*cols: str | Column, length: int = 16) -> Column:
    """Decimal-digit remap: BigInteger(md5concat).toString()[0:length] (F3).

    The md5 hex is 128 bits; conv(hex→dec) of the full hash overflows
    built-ins, so take the first 15 hex chars (60 bits, exact in conv) —
    deterministic, collision behavior equivalent for test purposes.
    """
    cs = [F.col(c).cast("string") if isinstance(c, str) else c for c in cols]
    h = F.md5(F.concat(*cs))
    return F.substring(F.conv(F.substring(h, 1, 15), 16, 10), 1, length)


def short_hash(col: str | Column, n: int = 8) -> Column:
    """MD5 prefix (F4: study-id hash, ``DeidentifyEncryptDICOM.java:242-243``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(c.cast("string")), 1, n)


def sanitize_filename(col: str | Column) -> Column:
    """``replaceAll("[^a-zA-Z0-9.^]", "_")`` (F6, ``ExtractDICOMTags.java:138-161``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, "[^a-zA-Z0-9.^]", "_")


@dataclass
class DeidentifyRules:
    """Rule table analog of ClinicalTrialsAttributes' fixed rules (F12)."""

    drop_columns: list[str] = field(default_factory=list)
    null_columns: list[str] = field(default_factory=list)
    replace_constants: dict[str, str] = field(default_factory=dict)
    audit_column: str = "deid_methods"


def apply_rules(df: DataFrame, rules: DeidentifyRules) -> DataFrame:
    """Remove / null-out / replace-with-constant + audit-trail append."""
    audit_entries = []
    for c in rules.null_columns:
        if c in df.columns:
            df = df.withColumn(c, F.lit(None).cast(df.schema[c].dataType))
            audit_entries.append(f"nulled:{c}")
    for c, v in rules.replace_constants.items():
        if c in df.columns:
            df = df.withColumn(c, F.lit(v))
            audit_entries.append(f"replaced:{c}")
    dropped = [c for c in rules.drop_columns if c in df.columns]
    if dropped:
        df = df.drop(*dropped)
        audit_entries.extend(f"removed:{c}" for c in dropped)
    base = (
        F.col(rules.audit_column)
        if rules.audit_column in df.columns
        else F.array().cast("array<string>")
    )
    return df.withColumn(
        rules.audit_column,
        F.array_union(base, F.array(*[F.lit(a) for a in audit_entries])),
    )


def _nested_struct_fields(df: DataFrame, array_col: str) -> list[T.StructField]:
    dt = df.schema[array_col].dataType
    if not isinstance(dt, T.ArrayType) or not isinstance(dt.elementType, T.StructType):
        raise ValueError(
            f"{array_col!r} must be ARRAY<STRUCT<...>> (got {dt.simpleString()})"
        )
    return list(dt.elementType.fields)


def transform_nested(
    df: DataFrame,
    array_col: str,
    field_fns: dict[str, Callable[[Column], Column]],
    drop_fields: list[str] | None = None,
) -> DataFrame:
    """Rewrite fields INSIDE an ``ARRAY<STRUCT<...>>`` column with
    ``F.transform`` — the nested-sequence recursion of the reference's
    deidentify/remap sweep (``ClinicalTrialsAttributes.
    removeOrNullIdentifyingAttributesRecursively:2528+`` and
    ``findUIDToRemap:1618-1648`` descend into ``SequenceAttribute`` nests).

    ``field_fns`` maps struct-field name → Column function applied to that
    field in every element; ``drop_fields`` removes fields entirely (the
    'remove' rule). Whole-stage-codegen higher-order expression — no
    explode/regroup shuffle, no Python.
    """
    fields = _nested_struct_fields(df, array_col)
    names = [f.name for f in fields]
    drop = set(drop_fields or [])
    for f in list(field_fns) + list(drop):
        if f not in names:
            raise ValueError(f"{array_col!r} element has no field {f!r}; has {names}")

    def rebuild(x: Column) -> Column:
        parts = []
        for f in names:
            if f in drop:
                continue
            c = field_fns[f](x[f]) if f in field_fns else x[f]
            parts.append(c.alias(f))
        return F.struct(*parts)

    return df.withColumn(array_col, F.transform(F.col(array_col), rebuild))


def apply_rules_nested(
    df: DataFrame, array_col: str, rules: DeidentifyRules
) -> DataFrame:
    """F12 recursion: apply a rule table to the fields of a nested
    ``ARRAY<STRUCT>`` column, with the same audit-trail contract as
    :func:`apply_rules` (entries read ``nulled:turns.props`` etc.)."""
    fields = {f.name: f for f in _nested_struct_fields(df, array_col)}
    fns: dict[str, Callable[[Column], Column]] = {}
    audit_entries = []
    for c in rules.null_columns:
        if c in fields:
            dt = fields[c].dataType
            fns[c] = lambda _x, _dt=dt: F.lit(None).cast(_dt)
            audit_entries.append(f"nulled:{array_col}.{c}")
    for c, v in rules.replace_constants.items():
        if c in fields:
            fns[c] = lambda _x, _v=v: F.lit(_v)
            audit_entries.append(f"replaced:{array_col}.{c}")
    dropped = [c for c in rules.drop_columns if c in fields]
    audit_entries.extend(f"removed:{array_col}.{c}" for c in dropped)
    out = transform_nested(df, array_col, fns, drop_fields=dropped)
    base = (
        F.col(rules.audit_column)
        if rules.audit_column in out.columns
        else F.array().cast("array<string>")
    )
    return out.withColumn(
        rules.audit_column,
        F.array_union(base, F.array(*[F.lit(a) for a in audit_entries])),
    )


def remap_nested(
    df: DataFrame,
    array_col: str,
    fields: list[str],
    remap_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """F13 recursion: deterministic key remap swept over fields inside a
    nested ``ARRAY<STRUCT>`` column (the UID-remap analog for transcript
    ``turns``/``attachments`` nests). ``remap_fn`` defaults to the engine's
    md5-based :func:`~nifi_dicom_spark.operators.keymap.deterministic_replacement`
    — deterministic, so no join into array elements is needed and replay is
    idempotent. Nulls stay null (nothing to remap)."""
    if remap_fn is None:
        from nifi_dicom_spark.operators.keymap import deterministic_replacement

        remap_fn = deterministic_replacement
    fns = {
        f: (lambda x, _fn=remap_fn: F.when(x.isNotNull(), _fn(x)))
        for f in fields
    }
    return transform_nested(df, array_col, fns)


def deidentify_with_dimension(
    records: DataFrame,
    identity_dim: DataFrame,
    key: str,
    dim_key: str,
    generate_on_miss: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Broadcast-join identity lookup with miss handling (J1).

    Returns ``(matched_or_generated, not_matched)``; with
    ``generate_on_miss`` the second frame is empty and misses get
    deterministic pseudo-identities (the reference's two modes,
    ``DeidentifyDICOM.java:220-234``).
    """
    dim_cols = [c for c in identity_dim.columns if c != dim_key]
    # explicit match flag: probing a payload column's null-ness would
    # misclassify a matched row whose first dimension value is legitimately
    # null as a miss (and overwrite its real mappings)
    dim = identity_dim.withColumnRenamed(dim_key, key).withColumn(
        "_dim_matched", F.lit(True)
    )
    joined = records.join(F.broadcast(dim), on=key, how="left")
    miss = F.col("_dim_matched").isNull()
    if generate_on_miss:
        # materialize the miss flag BEFORE overwriting any dim column, or the
        # predicate would re-evaluate against already-filled values
        out = joined.withColumn("_miss", miss)
        for c in dim_cols:
            gen = pseudo_name(key) if "name" in c.lower() else pseudo_id(key, salt=c)
            out = out.withColumn(c, F.when(F.col("_miss"), gen).otherwise(F.col(c)))
        out = out.drop("_miss", "_dim_matched")
        return out, out.limit(0)
    return (
        joined.filter(~miss).drop("_dim_matched"),
        joined.filter(miss).select(records.columns),
    )
