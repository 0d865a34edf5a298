"""CDCPipeline — the Structured Streaming change-log tail (SURVEY §2.1 S1,
§2.9 T1/T5/T6).

Reference shape: ``ListenDICOM`` receives pushed records, stamps provenance,
transfers with ``commitAsync`` and rolls back on failure
(``ListenDICOM.java:121-190``); downstream processors micro-batch via
``session.get(N)`` (``DecryptReidentifyDICOM.java:97-114``). Spark-first
shape: an offset-ordered file-source stream (``maxFilesPerTrigger`` ≙ the
batch-size knob W3) driving ``foreachBatch``, whose body is the batch
merge-apply planner. Exactly-once comes from TWO layers agreeing:

* Spark's checkpoint replays an epoch after a crash (at-least-once), and
* the SnapshotTable records ``(epoch, partition_id)`` commit keys atomically
  with the data, so the replayed epoch is detected and skipped (idempotent).

The dangerous window — crash AFTER the table merge but BEFORE the streaming
checkpoint commit — is exactly what the ledger closes (tested by
``tests/test_streaming.py::test_crash_between_merge_and_checkpoint``).

Per-partition lineage metrics (applied-op counts, quarantine counts,
high-watermark offsets; SURVEY T6/K7) are appended next to the checkpoint;
re-run epochs may append duplicate metric rows, so ``read_metrics`` dedups by
``(checkpoint_epoch, partition_id)`` — metrics follow the same idempotency
key as commits.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from nifi_dicom_spark.lake.snapshot_table import SnapshotTable
from nifi_dicom_spark.operators.apply import apply_changes


@dataclass
class CDCPipeline:
    spark: SparkSession
    events_dir: str
    table: SnapshotTable
    checkpoint_dir: str
    quarantine_dir: str | None = None
    metrics_dir: str | None = None
    max_files_per_trigger: int = 1
    #: change-log file format: "parquet" or "json" (ndjson wire format)
    fmt: str = "parquet"
    #: durable dead-letter table (SURVEY T7) — when set, every epoch records
    #: its quarantined events with retry counters, and events whose offsets
    #: exhausted ``max_retries`` are dropped from the batch BEFORE apply
    #: (poison events can't loop forever through the retry feed)
    dead_letter: SnapshotTable | None = None
    max_retries: int = 3
    #: hard cap on rows ``requeue_retryable`` pulls to the driver per call.
    #: The reject channel of a healthy stream is tiny, but a malformed-input
    #: flood (upstream schema break → every event quarantined) must not
    #: materialize the whole backlog in driver memory: rows beyond the cap
    #: stay quarantined and are picked up by the NEXT requeue call
    #: (lowest offsets first, so deferral is deterministic and makes
    #: progress).
    max_requeue_per_epoch: int = 100_000
    #: test hook: called (epoch, result) after each successful apply
    on_batch: Callable | None = None
    epochs_applied: list[int] = field(default_factory=list)

    def _source(self) -> DataFrame:
        from nifi_dicom_spark.sources.changelog import stream_change_log

        return stream_change_log(
            self.spark, self.events_dir, self.max_files_per_trigger, self.fmt
        )

    def _apply_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        t0 = time.monotonic()
        if self.dead_letter is not None:
            from nifi_dicom_spark.operators.deadletter import filter_poison

            # the guard of the penalize-then-retry loop: offsets past
            # max_retries are parked (NiFi's permanently-failed queue) —
            # they neither re-merge nor re-increment their counters
            batch_df = filter_poison(batch_df, self.dead_letter, self.max_retries)
        result = apply_changes(
            self.table,
            batch_df,
            epoch=epoch_id,
            quarantine_dir=self.quarantine_dir,
            dead_letter=self.dead_letter,
        )
        wall_ms = int((time.monotonic() - t0) * 1000)
        if self.metrics_dir and result.metrics:
            os.makedirs(self.metrics_dir, exist_ok=True)
            pdf = pd.DataFrame(result.metrics)
            pdf["wall_ms"] = wall_ms
            pdf["applied"] = result.merge.applied
            # write-temp-then-rename: a crash mid-write must not leave a
            # truncated .parquet that poisons every future read_metrics()
            final = os.path.join(
                self.metrics_dir, f"m-{epoch_id:012d}-{uuid.uuid4().hex[:8]}.parquet"
            )
            tmp = final + ".tmp"
            pdf.to_parquet(tmp, index=False)
            os.replace(tmp, final)
        self.epochs_applied.append(epoch_id)
        if self.on_batch is not None:
            self.on_batch(epoch_id, result)

    def run_available(self) -> None:
        """Consume everything currently in events_dir (availableNow) and
        stop — the replay/backfill mode; restartable from checkpoint."""
        q = (
            self._source()
            .writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def requeue_retryable(self) -> int:
        """Feed quarantined-but-retryable events back into the change log —
        the engine's analog of NiFi looping the ``failure`` relationship
        back into the processor's input queue (``DeidentifyDICOM.java:188``;
        SURVEY T7). Reads every quarantined row written so far, drops
        offsets that are already poison (≥ ``max_retries``), dedups by
        offset, and appends ONE new change-log file for the next trigger to
        pick up. At most ``max_requeue_per_epoch`` events are pulled to the
        driver per call; any excess is deferred to the next call. Returns
        the number of requeued events (0 = the loop has drained: everything
        left is poison or nothing is quarantined).

        Termination is structural: each retry epoch re-quarantines the same
        still-bad events, incrementing ``retry_count`` idempotently, until
        the poison threshold parks them and this method stops emitting."""
        if self.quarantine_dir is None or self.dead_letter is None:
            raise ValueError("requeue_retryable needs quarantine_dir + dead_letter")
        if int(self.max_requeue_per_epoch) < 1:
            # 0 would silently turn every drain loop ("while requeue() > 0")
            # into a no-op with events stuck in quarantine forever; there is
            # no "uncapped" sentinel — pass a large cap explicitly
            raise ValueError(
                f"max_requeue_per_epoch must be >= 1, got "
                f"{self.max_requeue_per_epoch}"
            )
        if not os.path.isdir(self.quarantine_dir):
            return 0
        from pyspark.sql import functions as F

        from nifi_dicom_spark.operators.deadletter import poison

        from nifi_dicom_spark.model import CHANGE_EVENTS_SCHEMA

        # epoch=N subdirs surface as a partition-discovery column — project
        # back to the wire schema before re-emitting
        bad = self.spark.read.parquet(self.quarantine_dir).select(
            *[f.name for f in CHANGE_EVENTS_SCHEMA.fields]
        )
        poisoned = poison(self.dead_letter, self.max_retries).select("offset")
        retry = bad.join(poisoned, on="offset", how="left_anti").dropDuplicates(
            ["offset"]
        )
        # Bound the driver-side materialization: a poison flood must not
        # pull the whole quarantine backlog into driver memory. Lowest
        # offsets first so the deferral is deterministic; the remainder is
        # requeued by subsequent calls (the loop structure tolerates
        # deferral — quarantine files persist until their events drain).
        capped = retry.orderBy("offset").limit(int(self.max_requeue_per_epoch))
        # emit ONE flat file like every other change-log file so the
        # streaming source's listing picks it up (a Spark directory-write
        # would nest part files the file source does not list)
        pdf = capped.toPandas()
        if len(pdf):
            import pyarrow as pa
            import pyarrow.parquet as pq

            from nifi_dicom_spark.model import ARROW_WIRE_FIELDS

            out = os.path.join(
                self.events_dir, f"retry-{uuid.uuid4().hex[:8]}.{self.fmt}"
            )
            if self.fmt == "json":
                pdf.to_json(out, orient="records", lines=True, date_format="iso")
            else:
                schema = pa.schema([(c, ARROW_WIRE_FIELDS[c]) for c in pdf.columns])
                pq.write_table(
                    pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
                    out,
                )
        return len(pdf)

    def read_metrics(self) -> pd.DataFrame:
        """Lineage metrics, deduped by the idempotency key."""
        if not self.metrics_dir or not os.path.isdir(self.metrics_dir):
            return pd.DataFrame()
        parts = [
            pd.read_parquet(os.path.join(self.metrics_dir, f))
            for f in sorted(os.listdir(self.metrics_dir))
            if f.endswith(".parquet")
        ]
        if not parts:
            return pd.DataFrame()
        df = pd.concat(parts, ignore_index=True)
        # prefer the original applied=True row per idempotency key, but keep
        # a replay-recomputed (applied=False) row when it is the ONLY record
        # of an epoch — the crash-after-merge-before-metrics-write window
        # would otherwise leave a permanent hole in lineage
        df = df.sort_values("applied", ascending=False, kind="stable")
        return (
            df.drop_duplicates(subset=["checkpoint_epoch", "partition_id"], keep="first")
            .reset_index(drop=True)
        )
