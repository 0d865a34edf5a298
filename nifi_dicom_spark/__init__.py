"""nifi_dicom_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-creates the capability class of blezek/nifi-dicom (a NiFi dataflow
ingest/transform/route/upsert pipeline over DICOM objects) as an idiomatic
Spark engine over conversation-transcript tables:

* change-log tail (binlog/WAL-style insert/update/delete events) consumed in
  offset-ordered micro-batches (Structured Streaming file source),
* last-writer-wins dedup by ``(conv_id, turn_idx)`` ordered ``(op_seq, offset)``
  via aggregation with map-side partial combine (two-phase reduce),
* applied to a snapshot-isolated lake table with MERGE semantics under
  idempotent commits keyed ``(checkpoint_epoch, partition_id)`` (exactly-once),
* schema evolution (late-added columns, widened types) with Arrow-schema
  reconciliation, and
* per-partition lineage/metrics persisted alongside the checkpoint.

The reference's behaviors are mapped operator-by-operator in SURVEY.md §2; each
module cites the reference file:line it draws semantics from.
"""

__version__ = "0.3.0"
