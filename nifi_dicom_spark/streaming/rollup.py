"""Continuous rollup: maintain a downstream AGGREGATE table incrementally
from a :class:`SnapshotTable`'s change feed — the continuous-aggregate /
materialized-view-maintenance pattern (TimescaleDB continuous aggregates,
Delta MV refresh), built from the engine's own parts:

    source table ──snapshot_cdf──▶ micro-batch of CDF images
                 ──signed delta per group──▶ read-modify-write merge
                 into the rollup table, exactly-once

Why CDF images make this exact: an UPDATE arrives as an
``update_preimage`` / ``update_postimage`` pair, so decrementable
aggregates (COUNT, SUM) are maintained by summing SIGNED contributions —
preimage/delete subtract, postimage/insert add. A row whose GROUP moves
(the group column itself was updated) is handled for free: the preimage
decrements the old group, the postimage increments the new one. Aggregates
that are not decrementable (MIN/MAX/percentiles) cannot be maintained this
way and are deliberately out of scope — recompute those from a snapshot.

Exactly-once at both ends, same wiring as ``replicate_stream``: stream
offsets are source versions in the checkpoint; each micro-batch merges
under ``commit_keys=[(batch_id, 0)]`` so a crash-replayed batch is a
ledger no-op. The read-modify-write is safe under replay because the
no-op is decided BEFORE the merge applies; it is safe under concurrency
because the rollup table's OCC rejects overlapping writers (one stream
owns a rollup).

Invariant (test-asserted): after the stream drains, the rollup equals
``SELECT group, COUNT(*), SUM(m) FROM source_state GROUP BY group``
recomputed from scratch — groups whose count reaches zero are deleted,
not left as zero rows.

At 100 TB: batch cost is ∝ the change set (one partial agg) plus a
bucket-pruned read of ONLY the touched groups' buckets on the rollup side
— never the source table, never the full rollup.

Reference analog: the reference's continuously-maintained series/study
counts and audit tallies over the ingest stream
(``DeidentificationService`` metrics) — here as an exactly-once derived
table instead of in-memory counters.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_dicom_spark.lake.snapshot_table import SnapshotTable
from nifi_dicom_spark.sources.table_stream import SnapshotCDFDataSource

__all__ = ["backfill_rollup", "create_rollup_table", "rollup_stream"]

_VERSION_COLS = ("op", "op_seq", "offset")


def create_rollup_table(
    spark: SparkSession,
    path: str,
    source: SnapshotTable,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    n_buckets: int = 8,
) -> SnapshotTable:
    """An empty rollup table keyed by ``group_cols`` with a ``n_rows``
    count and one ``sum_<c>`` per ``sum_cols`` entry (all doubles), plus
    the engine's version bookkeeping."""
    sum_cols = list(sum_cols or [])
    src = source.schema()
    names = {f.name: f for f in src.fields}
    missing = [c for c in (*group_cols, *sum_cols) if c not in names]
    if missing:
        raise ValueError(f"rollup columns not in source schema: {missing}")
    bad = sorted(set(group_cols) & set(_VERSION_COLS))
    if bad:
        raise ValueError(f"group cols collide with version bookkeeping: {bad}")
    fields = [T.StructField(c, names[c].dataType, True) for c in group_cols]
    fields.append(T.StructField("n_rows", T.LongType(), True))
    fields += [T.StructField(f"sum_{c}", T.DoubleType(), True) for c in sum_cols]
    fields += [
        T.StructField("op", T.StringType(), True),
        T.StructField("op_seq", T.LongType(), False),
        T.StructField("offset", T.LongType(), False),
    ]
    return SnapshotTable.create(
        spark,
        path,
        T.StructType(fields),
        key_cols=list(group_cols),
        n_buckets=n_buckets,
    )


def backfill_rollup(
    rollup: SnapshotTable,
    source: SnapshotTable,
    sum_cols: list[str] | None = None,
    version: int | None = None,
) -> int:
    """Seed ``rollup`` with the from-scratch GROUP BY of ``source`` at
    ``version`` (default: the current version) and return that SOURCE
    version — pass it as ``rollup_stream(starting_version=...)`` so the
    feed begins exactly where the backfill's snapshot ended, the recovery
    path :func:`rollup_stream`'s docstring prescribes for rollups that
    cannot start at the source's creation. One aggregate scan of the
    source; the seed merges as op_seq = the source version, so the first
    streamed batches (whose op_seq is a later commit version) LWW-win
    over it exactly when they should."""
    sum_cols = list(sum_cols or [])
    group_cols = rollup.key_cols()
    m = rollup.manifest()
    if m.get("files") or m.get("delta_files"):
        # seeding over existing rows would update seen groups but leave
        # groups absent from the snapshot stale — only an empty rollup can
        # be backfilled consistently
        raise ValueError("backfill_rollup requires an empty rollup table")
    v = int(source.current_version() if version is None else version)
    state = source.read(version=v)
    if "op" in state.columns:
        state = state.filter(F.col("op") != "delete")
    seed = state.groupBy(*group_cols).agg(
        F.count("*").alias("n_rows"),
        *[
            F.sum(F.coalesce(F.col(c).cast("double"), F.lit(0.0))).alias(f"sum_{c}")
            for c in sum_cols
        ],
    ).select(
        *group_cols,
        "n_rows",
        *[f"sum_{c}" for c in sum_cols],
        F.lit("update").alias("op"),
        F.lit(v).alias("op_seq"),
        F.lit(v).alias("offset"),
    )
    rollup.merge(seed, op_col="op", policy="versioned_upsert")
    return v


def rollup_stream(
    spark: SparkSession,
    source_path: str,
    rollup: SnapshotTable,
    checkpoint: str,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    starting_version: int | None = None,
    trigger_interval: str = "1 second",
):
    """Start (and return) the streaming query maintaining ``rollup`` from
    ``source_path``'s change feed. Stop via ``query.stop()``; restarting
    with the same ``checkpoint`` resumes exactly-once.

    ``starting_version`` must predate every row the rollup should count —
    unlike replication (where a later UPDATE re-delivers the full row and
    heals a skipped insert), an aggregate NEVER recovers a contribution it
    never saw: a skipped insert followed by a streamed group-migrating
    update leaves the old group permanently short by one. Start a fresh
    rollup at the source's creation version (or backfill the rollup from a
    snapshot first and start the feed at exactly that snapshot's version).

    Rows with a NULL in any group column are counted under that null
    group (SQL GROUP BY semantics) ONLY if the rollup table's key columns
    admit it — the engine's bucket placement hashes the first key column,
    and a null key never equi-joins, so null groups are REJECTED here
    (fail loudly at batch time) rather than silently misplaced. Coalesce
    nulls to a sentinel upstream if you need a null bucket.

    NULL metric semantics: null ``sum_cols`` values contribute 0.0, so a
    group whose metric values are ALL null stores ``sum_<c> = 0.0`` where
    SQL's ``SUM(c)`` would be NULL — the one documented divergence from
    the from-scratch GROUP BY (COUNT is unaffected)."""
    sum_cols = list(sum_cols or [])
    if list(group_cols) != rollup.key_cols():
        # bucket placement and the LWW merge are keyed by the TABLE's key
        # columns; a differing/reordered group list would prune the wrong
        # buckets and silently overwrite accumulated totals with
        # delta-only rows — reject instead
        raise ValueError(
            f"group_cols {list(group_cols)} must equal the rollup table's "
            f"key columns {rollup.key_cols()}"
        )
    have = set(rollup.schema().fieldNames())
    need = {"n_rows", *(f"sum_{c}" for c in sum_cols)}
    if not need <= have:
        raise ValueError(
            f"rollup table lacks aggregate column(s) {sorted(need - have)}; "
            "create it with create_rollup_table(..., sum_cols=...)"
        )
    # exact-match, not subset: the LWW merge conforms missing columns to
    # null, so streaming FEWER sum_cols than the table carries would
    # silently null the omitted sum_<c> totals for every touched group
    table_sums = {
        f for f in have if f.startswith("sum_") and f not in rollup.key_cols()
    }
    if {f"sum_{c}" for c in sum_cols} != table_sums:
        raise ValueError(
            f"sum_cols {sorted(sum_cols)} must cover the rollup table's "
            f"aggregate columns exactly ({sorted(table_sums)}): omitted "
            "columns would be overwritten with null on every touched group"
        )
    spark.dataSource.register(SnapshotCDFDataSource)
    reader = (
        spark.readStream.format("snapshot_cdf")
        .option("path", source_path)
        .option("mode", "cdf")
    )
    if starting_version is not None:
        reader = reader.option("startingVersion", starting_version)
    feed = reader.load()

    known = ("insert", "update_preimage", "update_postimage", "delete")
    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"), F.lit(1))
        .when(F.col("_change_type").isin("delete", "update_preimage"), F.lit(-1))
    )

    def apply_batch(batch_df, batch_id: int) -> None:
        # one fused validation/metadata pass (the micro-batch is uncached;
        # separate limit(1) probes would re-read the CDF partitions once
        # per check): row count, newest covered commit (the batch's
        # deterministic op_seq under replay), unknown-change-type count,
        # and null-in-ANY-group-column count
        null_pred = F.col(group_cols[0]).isNull()
        for g in group_cols[1:]:
            null_pred = null_pred | F.col(g).isNull()
        stats = batch_df.agg(
            F.count("*").alias("n"),
            F.max("_commit_version").alias("v"),
            F.count(
                F.when(~F.col("_change_type").isin(*known), F.lit(1))
            ).alias("bad"),
            F.count(F.when(null_pred, F.lit(1))).alias("nullg"),
        ).collect()[0]
        if stats["n"] == 0:
            return
        if stats["bad"]:
            raise ValueError(
                f"{stats['bad']} row(s) with an unexpected _change_type in "
                "the rollup feed"
            )
        if stats["nullg"]:
            raise ValueError(
                f"null value in group column(s) {group_cols}; coalesce to a "
                "sentinel upstream (null keys cannot be bucket-placed)"
            )
        seq = int(stats["v"])
        aggs = [F.sum(sign).cast("long").alias("_d_n")]
        aggs += [
            F.sum(sign.cast("double") * F.coalesce(F.col(c).cast("double"), F.lit(0.0))).alias(f"_d_{c}")
            for c in sum_cols
        ]
        delta = batch_df.groupBy(*group_cols).agg(*aggs)

        # read-modify-write restricted to touched groups: the rollup read
        # prunes to the delta's buckets; the join is group-key equi
        touched = delta.select(*group_cols)
        bucket = rollup.bucket_expr()  # always the manifest's key column
        buckets = sorted(
            r[0] for r in touched.select(bucket.alias("b")).distinct().collect()
        )
        cur = rollup.read(buckets=buckets).filter(F.col("op") != "delete")
        cur = cur.join(touched, on=group_cols, how="left_semi")
        merged = cur.select(
            *group_cols,
            F.col("n_rows"),
            *[F.col(f"sum_{c}") for c in sum_cols],
        ).join(delta, on=group_cols, how="full_outer")
        new_n = F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(
            F.col("_d_n"), F.lit(0)
        )
        ev = merged.select(
            *group_cols,
            new_n.alias("n_rows"),
            *[
                (
                    F.coalesce(F.col(f"sum_{c}"), F.lit(0.0))
                    + F.coalesce(F.col(f"_d_{c}"), F.lit(0.0))
                ).alias(f"sum_{c}")
                for c in sum_cols
            ],
            F.when(new_n <= 0, "delete").otherwise("update").alias("op"),
            F.lit(seq).alias("op_seq"),
            F.lit(seq).alias("offset"),
        )
        rollup.merge(
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
