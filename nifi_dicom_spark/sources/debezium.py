"""Debezium-envelope CDC adapter (SURVEY §2.1 S1/S5 — the connector wire
format a binlog/WAL tail actually emits).

The engine's native change-event frame (:data:`CHANGE_EVENTS_SCHEMA`) is the
normalized form; real deployments receive Debezium JSON envelopes from
Kafka::

    {"payload": {"before": {...}|null, "after": {...}|null,
                 "op": "c"|"r"|"u"|"d", "ts_ms": 1704067200123,
                 "source": {"lsn": 9873422, "txId": 771, ...}}}

This module turns a DataFrame of such envelope strings into the canonical
frame with ONE ``from_json`` + column expressions — pure JVM codegen, works
identically on batch and streaming inputs (no action, no UDF).

Mapping (Debezium → engine):

* ``op`` c/r (create/snapshot-read) → ``insert``; u → ``update``;
  d → ``delete`` (image taken from ``before``); anything else → null op,
  which the validity router (P2/P8) quarantines.
* ``source.lsn`` → ``offset`` AND ``op_seq`` — the log sequence number is
  the total order of the WAL, exactly the LWW version the merge sorts by.
* payload ``ts`` is Debezium's ``io.debezium.time.MicroTimestamp`` (epoch
  micros, int64) → TimestampType.
* ``schema_ver`` = 2 (the adapter's fixed envelope payload carries the full
  current wire schema; absent fields parse as null, which is the same
  contract :func:`read_change_log` pins for mixed-vintage parquet).

Reference analog: the reference's ingest boundary converts the network wire
format into its internal attribute list one message at a time
(``ListenDICOM`` → flow file); this adapter is that boundary for a
Spark-first engine — declarative, vectorized, streaming-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["DEBEZIUM_ENVELOPE_SCHEMA", "parse_debezium"]

#: payload image fields as Debezium serializes the transcripts table
#: (timestamps as epoch-micros int64)
_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.LongType(), True),
    ]
)

_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), True),
        T.StructField("txId", T.LongType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("connector", T.StringType(), True),
    ]
)

DEBEZIUM_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("before", _IMAGE_SCHEMA, True),
                    T.StructField("after", _IMAGE_SCHEMA, True),
                    T.StructField("op", T.StringType(), True),
                    T.StructField("ts_ms", T.LongType(), True),
                    T.StructField("source", _SOURCE_SCHEMA, True),
                ]
            ),
            True,
        )
    ]
)


def parse_debezium(
    df: DataFrame,
    value_col: str = "value",
    partition_col: str | Column | None = None,
) -> DataFrame:
    """Normalize Debezium JSON envelopes in ``df[value_col]`` into the
    engine's change-event frame (column order/types =
    :data:`CHANGE_EVENTS_SCHEMA`).

    ``partition_col``: the Kafka partition of each record (column name or
    expression) — becomes ``partition_id`` (the exactly-once commit-key
    dimension); defaults to 0 for single-partition feeds/files. Works on
    batch and streaming DataFrames alike (pure expressions).
    """
    p = F.from_json(F.col(value_col), DEBEZIUM_ENVELOPE_SCHEMA)["payload"]
    img = F.when(p["op"] == "d", p["before"]).otherwise(p["after"])
    part = (
        F.lit(0)
        if partition_col is None
        else (F.col(partition_col) if isinstance(partition_col, str) else partition_col)
    )
    return df.select(
        p["source"]["lsn"].cast("long").alias("offset"),
        part.cast("int").alias("partition_id"),
        F.when(p["op"].isin("c", "r"), "insert")
        .when(p["op"] == "u", "update")
        .when(p["op"] == "d", "delete")
        .alias("op"),
        p["source"]["lsn"].cast("long").alias("op_seq"),
        img["conv_id"].alias("conv_id"),
        img["turn_idx"].alias("turn_idx"),
        img["role"].alias("role"),
        img["text"].alias("text"),
        F.lit(2).alias("schema_ver"),
        img["tool"].alias("tool"),
        F.timestamp_micros(img["ts"]).alias("ts"),
    ).select(
        "offset",
        "partition_id",
        "op",
        "op_seq",
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
        "schema_ver",
    )
