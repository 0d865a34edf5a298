"""Key-partitioned writer-wins dedup (SURVEY §2.5 A1, §2.6 W2).

Reference semantics: entity inserts are FIRST-writer-wins
(``DatabaseInformationModel.java:787-794``; test ``DeidentifyDICOMTest.java:81-103``
— 3 files sharing a series ⇒ 6 uid mappings, not 12), while attribute
re-application is overwrite (``DecryptReidentifyDICOM.java:192-193``). The
CDC engine pins LAST-writer-wins per ``(conv_id, turn_idx)`` with total order
``(op_seq, offset)`` (offset tie-breaks duplicate op_seq).

Scale design — why ``max_by`` aggregation, not a ``row_number`` window:
an aggregation gets map-side partial combine (two-phase local→global reduce
for free), so a hot conversation key collapses to ONE row per map task before
the shuffle — the generic fix for celebrity-key skew at 10^10 events. A
window function would shuffle+sort ALL duplicate rows of the hot key into one
task first. ``lww_dedup_window`` is kept for comparison/testing, and
``lww_dedup_salted`` demonstrates explicit two-phase salting for engines
without partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup(events: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """One row per key: the event with max (op_seq, offset).

    Single shuffle with map-side partial aggregation (check the plan: two
    HashAggregate nodes around the Exchange).
    """
    key_cols = key_cols or ["conv_id", "turn_idx"]
    payload = [c for c in events.columns if c not in key_cols]
    winner = F.max_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct(F.col("op_seq"), F.col("offset")),
    ).alias("_w")
    out = events.groupBy(*key_cols).agg(winner)
    return out.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])


def fww_dedup(events: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """First-writer-wins variant (the reference's insertObject contract)."""
    key_cols = key_cols or ["conv_id", "turn_idx"]
    payload = [c for c in events.columns if c not in key_cols]
    winner = F.min_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct(F.col("op_seq"), F.col("offset")),
    ).alias("_w")
    out = events.groupBy(*key_cols).agg(winner)
    return out.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])


def lww_dedup_window(events: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """row_number()==1 formulation (SURVEY A1's literal mapping). Correct but
    skew-prone: kept as the semantic cross-check in tests."""
    key_cols = key_cols or ["conv_id", "turn_idx"]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("op_seq").desc(), F.col("offset").desc()
    )
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_dedup_salted(
    events: DataFrame, key_cols: list[str] | None = None, n_salt: int = 16
) -> DataFrame:
    """Explicit two-phase salted reduce (SURVEY §7.2 M4): phase 1 reduces
    within (key, salt) buckets — splitting a hot key across `n_salt` reducers —
    phase 2 reduces the ≤n_salt survivors per key. Deterministic salt from
    op_seq/offset so replay is stable."""
    key_cols = key_cols or ["conv_id", "turn_idx"]
    payload = [c for c in events.columns if c not in key_cols]
    salted = events.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("op_seq"), F.col("offset")), F.lit(n_salt))
    )
    phase1 = (
        salted.groupBy(*key_cols, "_salt")
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in payload]),
                F.struct(F.col("op_seq"), F.col("offset")),
            ).alias("_w")
        )
        .select(*key_cols, "_w")
    )
    phase2 = (
        phase1.groupBy(*key_cols)
        .agg(
            F.max_by(
                F.col("_w"), F.struct(F.col("_w.op_seq"), F.col("_w.offset"))
            ).alias("_w")
        )
        .select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload])
    )
    return phase2
