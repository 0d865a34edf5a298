"""Change-log source connectors (SURVEY §2.1 S1/S5).

ALWAYS read the event log with the explicit superset schema. A bare
``spark.read.parquet(dir)`` over a mixed-schema directory (files written
before/after the ``tool`` column appeared) silently adopts ONE file's schema
— pre-evolution files then erase the column for every row. Pinning the
schema makes the parquet reader fill missing columns with nulls per file,
which is the correct schema-evolution read (reference precedent: columns
added by ``ALTER TABLE`` are null for pre-existing rows,
``DatabaseInformationModel.java:672-698``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nifi_dicom_spark.model import CHANGE_EVENTS_SCHEMA


def read_change_log(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of a change-log directory (backfill / full replay)."""
    return spark.read.schema(CHANGE_EVENTS_SCHEMA).parquet(path)


def stream_change_log(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming tail of a change-log directory, offset-ordered micro-batches
    (``maxFilesPerTrigger`` ≙ the reference's batch-size knob, SURVEY W3)."""
    return (
        spark.readStream.schema(CHANGE_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("latestFirst", "false")
        .parquet(path)
    )
