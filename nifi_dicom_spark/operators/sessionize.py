"""Gap-timeout sessionization + completeness windows (SURVEY §2.9 T2, §2.5 A6).

Reference: ``StudyReceiver`` treats a study as complete only after a
quiescence interval — ``now − mostRecentInsertionTime > interval``
(``StudyReceiver.processStudyIfComplete:225-243``), with late/duplicate
arrivals resetting the processed flag (``:297-305``).

Batch shape: classic lag+cumsum sessionization — a new session starts where
the gap to the previous event exceeds the timeout. One window partition per
key; the session id is a running sum (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(col: Column) -> Column:
    """Timestamp → fractional epoch seconds, robust to TIMESTAMP_NTZ inputs.

    A session with ``inferTimestampNTZ=true`` reads pandas-written parquet
    (``timestamp[us]``, no tz) as TIMESTAMP_NTZ, which cannot be cast to
    DOUBLE directly.  NTZ→LTZ is exact under the engine's pinned UTC session
    timezone (see ``operators/reconcile.py``), so route through LTZ first.
    """
    return col.cast("timestamp_ltz").cast("double")


def sessionize(
    df: DataFrame, key_cols: list[str], ts_col: str, gap_seconds: int
) -> DataFrame:
    """Add a ``session_id`` column: 0-based per key, new session when the
    gap from the previous event > gap_seconds."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(ts_col))
    prev = F.lag(F.col(ts_col)).over(w)
    gap = _epoch_seconds(F.col(ts_col)) - _epoch_seconds(prev)
    new_session = F.when(prev.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        - 1,
    )


def session_stats(
    df: DataFrame, key_cols: list[str], ts_col: str, gap_seconds: int
) -> DataFrame:
    """Per-key session counts + per-session spans (the study-completeness
    bookkeeping: max insertion time per group ≙ A6)."""
    s = sessionize(df, key_cols, ts_col, gap_seconds)
    return s.groupBy(*key_cols, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def quiescent_groups(
    df: DataFrame, key_cols: list[str], ts_col: str, now: str, gap_seconds: int
) -> DataFrame:
    """Groups whose most-recent event is older than the gap — 'ready to
    process' (processStudyIfComplete's predicate)."""
    agg = df.groupBy(*key_cols).agg(F.max(ts_col).alias("last_ts"))
    return agg.filter(
        _epoch_seconds(F.lit(now).cast("timestamp"))
        - _epoch_seconds(F.col("last_ts"))
        > gap_seconds
    )
