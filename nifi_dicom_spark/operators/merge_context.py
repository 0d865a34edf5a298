"""Group-context merge — priority merge of grouped records (SURVEY §2.5 A2/A3).

Reference: ``MergeCompositeContext`` groups instances by shared study UID and
merges group context with two rules (``apps/MergeCompositeContext.java``):
* earliest group (lowest sequence number) takes priority (``:149-155``),
* within a merge, non-empty values override empty/dummy ones per attribute
  (``:120-144``).

Spark shape: ``min_by`` / ``first(ignorenulls)`` over an ordered aggregation —
one shuffle with map-side combine. (True union-find connected components is
out of engine scope; direct keys suffice — SURVEY A2.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def priority_merge(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str,
    value_cols: list[str],
    empty_is_null: bool = True,
) -> DataFrame:
    """One row per key: for each value column, the value of the
    lowest-sequence record that has a non-null (and, optionally, non-empty)
    value — 'earliest wins, but never pick a dummy over a real value'."""
    aggs = []
    for c in value_cols:
        v = F.col(c)
        if empty_is_null:
            v = F.when(F.trim(v.cast("string")) == "", None).otherwise(v)
        # min_by over rows where the value exists: NULL values are excluded
        # by replacing their ordering key with +inf via a null-safe struct
        aggs.append(
            F.min_by(v, F.when(v.isNotNull(), F.col(seq_col))).alias(c)
        )
    return df.groupBy(*key_cols).agg(*aggs)
