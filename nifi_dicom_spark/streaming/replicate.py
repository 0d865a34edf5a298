"""Table→table CDC replication: tail one :class:`SnapshotTable`'s change
feed (the ``snapshot_cdf`` streaming source) and apply it to another with
exactly-once semantics — the engine eating its own dog food end-to-end:

    source table ──snapshot_cdf──▶ micro-batch of CDF images
                 ──map to change events──▶ versioned LWW merge into replica

Wiring that makes it exactly-once at BOTH ends:

* read side — stream offsets are source-table versions in the stream
  checkpoint; a restarted query resumes after the last committed batch;
* write side — each micro-batch merges under ``commit_keys=[(batch_id,
  0)]``, so a batch replayed after a crash between sink-write and
  checkpoint-commit is a no-op against the replica's ledger (the same
  idempotency contract the primary ingest path uses).

Ordering: a micro-batch's diff is collapsed per key (one image pair per
key per batch), and ``op_seq = _commit_version`` makes LWW across batches
follow source-commit order, so replica state converges to source state
regardless of micro-batch boundaries. ``update_preimage`` rows are
dropped — the merge applies post-states.

At scale this is the change-data-capture fan-out pattern (primary →
read replicas / downstream marts) with cost ∝ changed buckets per commit
on the read side and ∝ change set per batch on the write side.

Reference analog: nifi-dicom's core deployment is exactly this pipeline —
``ListenDICOM → DeidentifyDICOM → PutDICOM`` relays studies from one PACS
to another as a continuous flow (``ListenDICOM.java`` receive side,
``PutDICOM.java`` send side, flow files in between). ``replicate_stream``
is that flow Spark-first: source-table commits in, exactly-once keyed
merge out.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nifi_dicom_spark.lake.snapshot_table import SnapshotTable
from nifi_dicom_spark.sources.table_stream import SnapshotCDFDataSource

__all__ = ["create_replica_table", "replicate_stream"]

_VERSION_COLS = ("op", "op_seq", "offset")


def create_replica_table(
    spark: SparkSession, path: str, source: SnapshotTable, n_buckets: int | None = None
) -> SnapshotTable:
    """An empty versioned replica with the source's visible schema (its
    own op/op_seq/offset bookkeeping appended if absent) and key columns."""
    from pyspark.sql import types as T

    schema = source.schema()
    fields = [f for f in schema.fields]
    names = {f.name for f in fields}
    present = names & set(_VERSION_COLS)
    if present and present != set(_VERSION_COLS):
        # a partial overlap is ambiguous: the source column would collide
        # with (or masquerade as) the replica's version bookkeeping
        raise ValueError(
            f"source columns {sorted(present)} collide with the replica's "
            f"version bookkeeping {_VERSION_COLS}; rename them or provide "
            "all three (a fully versioned source)"
        )
    if not present:
        fields += [
            T.StructField("op", T.StringType(), True),
            T.StructField("op_seq", T.LongType(), False),
            T.StructField("offset", T.LongType(), False),
        ]
    return SnapshotTable.create(
        spark,
        path,
        T.StructType(fields),
        key_cols=source.key_cols(),
        n_buckets=n_buckets or source.n_buckets(),
    )


def replicate_stream(
    spark: SparkSession,
    source_path: str,
    replica: SnapshotTable,
    checkpoint: str,
    starting_version: int | None = None,
    trigger_interval: str = "1 second",
    mode: str = "cdf",
):
    """Start (and return) the streaming query replicating ``source_path``
    into ``replica``. Stop it via ``query.stop()``; restarting with the
    same ``checkpoint`` resumes exactly-once.

    ``mode="cdf"`` (default) replicates from collapsed state diffs —
    works for any source, cost ∝ changed buckets' state. ``mode=
    "upserts"`` replicates from the delta files each commit appended —
    cost ∝ the change set (requires a merge-on-read source); a batch
    spanning several commits may carry several rows per key, so the
    apply LWW-reduces by source commit version before merging."""
    if mode not in ("cdf", "upserts"):
        raise ValueError(f"mode must be cdf|upserts, got {mode!r}")
    spark.dataSource.register(SnapshotCDFDataSource)
    reader = (
        spark.readStream.format("snapshot_cdf")
        .option("path", source_path)
        .option("mode", mode)
    )
    if starting_version is not None:
        reader = reader.option("startingVersion", starting_version)
    feed = reader.load()

    payload = [
        c
        for c in feed.columns
        if c not in ("_change_type", "_commit_version", *_VERSION_COLS)
    ]
    known = (
        ("insert", "update_preimage", "update_postimage", "delete")
        if mode == "cdf"
        else ("insert", "update", "delete")
    )

    def apply_batch(batch_df, batch_id: int) -> None:
        bad = (
            batch_df.filter(~F.col("_change_type").isin(*known))
            .limit(1)
            .collect()
        )
        if bad:
            # never map an unknown change type onto a destructive op —
            # any future type must be wired explicitly, not swallowed
            raise ValueError(
                f"unexpected _change_type {bad[0]['_change_type']!r} in "
                f"replication feed (mode={mode})"
            )
        ev = batch_df.filter(
            F.col("_change_type") != F.lit("update_preimage")
        ).select(
            *payload,
            F.when(F.col("_change_type") == "insert", "insert")
            .when(F.col("_change_type").isin("update_postimage", "update"), "update")
            .otherwise("delete")
            .alias("op"),
            F.col("_commit_version").alias("op_seq"),
            F.col("_commit_version").alias("offset"),
        )
        if mode == "upserts":
            # several commits per batch ⇒ up to one row per key PER
            # commit; keep the latest commit's row (key, commit) is
            # unique, so the reduce is deterministic
            from nifi_dicom_spark.operators.dedup import lww_dedup

            ev = lww_dedup(ev, replica.key_cols())
        replica.merge(
            ev,
            op_col="op",
            policy="versioned_upsert",
            commit_keys=[(int(batch_id), 0)],
        )

    return (
        feed.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=trigger_interval)
        .start()
    )
