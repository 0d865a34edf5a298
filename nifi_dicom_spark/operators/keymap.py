"""Key-map lookup-or-create — the uid_map analog (SURVEY §2.2 K4, §2.4 J2).

Reference: every UID is remapped through a durable ``uid_map(original,
replaced)`` with a global lock around ``MERGE INTO uid_map … WHEN NOT MATCHED
THEN INSERT`` + re-select (``DeidentificationController.java:102-124``) — the
reference's concurrency bottleneck (§3.2 step 5).

Spark-first replacement: **deterministic** replacement keys (md5-derived, the
reference's own F2-F5 precedent) make allocation conflict-free and replayable:

1. new keys found per batch via ``left_anti`` against the map table,
2. appended with ``insert_if_absent`` MERGE (first-writer-wins — re-inserts
   of the same key are no-ops, so cardinality never grows on replay: the
   ``DeidentifyDICOMTest.java:81-103`` "6 not 12" contract),
3. lookups are bucket-pruned reads of the requested keys' buckets; the
   per-batch subset is broadcast at join time (:func:`remap_column`).

No cross-batch hot-key cache exists ON PURPOSE: the reference's Guava
``LoadingCache`` avoided re-querying *stored random* mappings; here the
mapping is a pure md5 function of the key, so re-deriving it costs one JVM
hash — the durable table exists for auditability and the first-writer-wins
cardinality contract, not as the source of truth for lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_dicom_spark.lake.snapshot_table import SnapshotTable

KEYMAP_SCHEMA = T.StructType(
    [
        T.StructField("original", T.StringType(), False),
        T.StructField("replaced", T.StringType(), False),
    ]
)


def deterministic_replacement(col) -> "F.Column":
    """md5-derived replacement — idempotent across replays (F5 precedent:
    name-based UID remap, ``DeidentifyEncryptDICOM.java:319-326``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("string"))


def create_keymap(spark: SparkSession, path: str, n_buckets: int = 8) -> SnapshotTable:
    return SnapshotTable.create(
        spark, path, KEYMAP_SCHEMA, key_cols=["original"], n_buckets=n_buckets
    )


def lookup_or_create(
    keymap: SnapshotTable, keys: DataFrame, key_col: str
) -> DataFrame:
    """Ensure every distinct key has a mapping; return the map rows for the
    requested keys (two-step lookup-or-create, set-based — no lock).

    The map table is bucketed, so both the merge and the read-back prune to
    the buckets of the requested keys: at 10^9 stored keys a micro-batch
    touching a handful of buckets scans only those bucket files, never the
    full table. Bucket discovery is one collect bounded by ``n_buckets``
    (O(config), not O(data))."""
    distinct = keys.select(F.col(key_col).alias("original")).distinct()
    touched = sorted(
        r["b"]
        for r in distinct.select(keymap.bucket_expr("original").alias("b"))
        .distinct()
        .collect()
    )
    new_mappings = distinct.withColumn(
        "replaced", deterministic_replacement("original")
    )
    keymap.merge(
        new_mappings,
        op_col=None,
        policy="insert_if_absent",
        touched_buckets=touched,
    )
    return keymap.read(buckets=touched).join(distinct, on="original", how="left_semi")


def remap_column(
    df: DataFrame, keymap_df: DataFrame, col: str, broadcast: bool = True
) -> DataFrame:
    """Apply the map to one column (F13's per-UID-column sweep)."""
    m = keymap_df.select(
        F.col("original").alias(col), F.col("replaced").alias(f"__{col}_new")
    )
    if broadcast:
        m = F.broadcast(m)
    return (
        df.join(m, on=col, how="left")
        .withColumn(col, F.coalesce(F.col(f"__{col}_new"), F.col(col)))
        .drop(f"__{col}_new")
    )
