"""Dead-letter table with retry bookkeeping (SURVEY §2.9 T7).

Reference: bad records are *penalized* before routing to ``failure``, and
failure relationships are typically looped back into the processor for
retry (``DeidentifyDICOM.java:188``; NiFi's penalize-then-retry loop). The
engine's analog: quarantined events land in a durable dead-letter
:class:`~nifi_dicom_spark.lake.snapshot_table.SnapshotTable` keyed by
``offset``, with a ``retry_count`` that increments every epoch the same
event is quarantined again, a diagnosis ``reason``, and first/last-seen
epochs. Events whose count passes ``max_retries`` are *poison* — they stop
looping and wait for operator attention (the reference parks them on the
failure queue the same way).

Scale shape: dead letters are a tiny, bucket-pruned table; recording a batch
is one join against the touched buckets + one versioned LWW merge (epoch =
the version), idempotent under epoch replay via the same commit-key ledger
as the data path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_dicom_spark.lake.snapshot_table import SnapshotTable
from nifi_dicom_spark.model import OPS

DEADLETTER_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType(), False),
        T.StructField("op", T.StringType(), True),  # versioned-merge op column
        T.StructField("op_seq", T.LongType(), False),  # = last epoch seen
        T.StructField("reason", T.StringType(), True),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("first_epoch", T.LongType(), False),
        T.StructField("last_epoch", T.LongType(), False),
    ]
)


def quarantine_reason() -> Column:
    """Diagnosis for a quarantined event — which validity arm failed
    (mirrors ``validity_predicate``)."""
    return (
        F.when(F.col("conv_id").isNull(), F.lit("null_key"))
        .when(F.coalesce(F.col("turn_idx") < 0, F.lit(True)), F.lit("bad_turn_idx"))
        # coalesce(..., True): NULL op makes isin three-valued-NULL, which
        # would skip this arm and misdiagnose as null_op_seq/unknown (the
        # turn_idx arm above guards the same way)
        .when(F.coalesce(~F.col("op").isin(*OPS), F.lit(True)), F.lit("unknown_op"))
        .when(F.col("op_seq").isNull(), F.lit("null_op_seq"))
        .otherwise(F.lit("unknown"))
    )


def create_deadletter(
    spark: SparkSession, path: str, n_buckets: int = 8
) -> SnapshotTable:
    return SnapshotTable.create(
        spark, path, DEADLETTER_SCHEMA, key_cols=["offset"], n_buckets=n_buckets
    )


def record_quarantine(
    dl: SnapshotTable, bad: DataFrame, epoch: int
) -> DataFrame:
    """Record one epoch's quarantined events; returns the STORED rows for
    the batch's offsets (so a replayed epoch returns the original counts,
    not a speculative re-increment).

    Re-quarantined offsets increment ``retry_count`` (read-modify-write
    against only the touched buckets); replaying the same epoch is a no-op
    via the commit ledger, so counts never double-increment on crash/restart
    (exactly-once for the reject channel too). A batch with no quarantined
    events returns empty without any write/commit."""
    # min(reason), not dropDuplicates: when one offset appears twice in a
    # batch with DIFFERENT failing arms, dropDuplicates keeps an arbitrary
    # partition-order-dependent row (a task retry could store a different
    # reason) — min is a pure function of the data, replay-deterministic.
    fresh = (
        bad.select(
            F.col("offset").cast("long").alias("offset"),
            quarantine_reason().alias("reason"),
        )
        .groupBy("offset")
        .agg(F.min("reason").alias("reason"))
    )
    touched = sorted(
        r["b"]
        for r in fresh.select(dl.bucket_expr("offset").alias("b")).distinct().collect()
    )
    if not touched:  # clean epoch: no write, no version churn
        return dl.read(buckets=[]).select(
            "offset", "reason", "retry_count", "first_epoch", "last_epoch"
        )
    prior = dl.read(buckets=touched).select(
        F.col("offset"),
        F.col("retry_count").alias("_prior_count"),
        F.col("first_epoch").alias("_prior_first"),
    )
    entries = (
        fresh.join(prior, on="offset", how="left")
        .select(
            "offset",
            F.lit("update").alias("op"),
            F.lit(int(epoch)).cast("long").alias("op_seq"),
            "reason",
            (F.coalesce(F.col("_prior_count"), F.lit(0)) + 1)
            .cast("int")
            .alias("retry_count"),
            F.coalesce(F.col("_prior_first"), F.lit(int(epoch)))
            .cast("long")
            .alias("first_epoch"),
            F.lit(int(epoch)).cast("long").alias("last_epoch"),
        )
    )
    dl.merge(
        entries,
        op_col="op",
        policy="versioned_upsert",
        commit_keys=[(int(epoch), 0)],
        touched_buckets=touched,
    )
    # return what is actually STORED (merge may have been a ledger no-op)
    return dl.read(buckets=touched).join(
        fresh.select("offset"), on="offset", how="left_semi"
    ).select("offset", "reason", "retry_count", "first_epoch", "last_epoch")


def poison(dl: SnapshotTable, max_retries: int) -> DataFrame:
    """Events that exhausted their retries — parked for operator attention
    (the reference's permanently-failed queue)."""
    return dl.read().filter(F.col("retry_count") >= max_retries)


def retryable(dl: SnapshotTable, max_retries: int) -> DataFrame:
    """Offsets still eligible for the penalize-then-retry loop."""
    return dl.read().filter(F.col("retry_count") < max_retries)


def filter_poison(
    events: DataFrame, dl: SnapshotTable, max_retries: int
) -> DataFrame:
    """Drop events whose offsets have exhausted their retries — the guard a
    retry loop applies before re-feeding the failure queue into the
    pipeline, so a poison event cannot loop forever (the reference parks it
    on the failure relationship the same way)."""
    poisoned = poison(dl, max_retries).select("offset")
    return events.join(poisoned, on="offset", how="left_anti")
