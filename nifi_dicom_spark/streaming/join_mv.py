"""Continuous JOIN materialization: maintain a downstream JOIN table
incrementally from TWO :class:`SnapshotTable` change feeds — incremental
view maintenance beyond aggregates (:mod:`.rollup` covers GROUP BY; this
covers the enrichment join every CDC pipeline ends in: facts × dimension).

    left (facts)  ──snapshot_cdf──┐
                                  ├─ union(tagged key projections)
    right (dim)   ──snapshot_cdf──┘        │ one micro-batch
                                           ▼
                  touched LEFT keys = (left-delta keys)
                                    ∪ (left rows matching right-delta join keys)
                  recompute those keys: σ(left) ⋈ right  →  versioned merge
                  (vanished keys → tombstones), exactly-once per batch

Maintenance strategy — recompute-touched-keys, not differential deltas:
an UPDATE to a dimension row must rewrite EVERY joined fact row carrying
its key, and a differential formulation (ΔL⋈R ∪ L⋈ΔR ∪ ΔL⋈ΔR) needs
retraction bookkeeping that LWW tables don't carry. Instead each batch
identifies the affected LEFT KEYS exactly and re-derives their join
output from the current snapshots — the same hybrid arm the rollup uses
for non-decrementable aggregates, here applied to the whole row. Replay
is idempotent by construction (recompute is a pure function of the
snapshots + touched set; the ledger skips committed batches).

Scope: the N:1 ENRICHMENT join — ``right``'s key columns ARE the join
columns (one dimension row per join key), MV rows keyed by the LEFT
table's keys, ``how`` inner or left. Many-to-many joins would need
composite MV keys and a pair-explosion recompute; out of scope, loudly.

Cost model at 100 TB: a fact-side delta touches only its own keys —
the recompute is a key-set semi-join (AQE broadcasts the delta-sized
set) and the merge shuffles only touched buckets. A DIMENSION-side
delta is inherently a fan-out write (every fact with that key rewrites
— no engine avoids this; it is the price of materializing the join):
the touched-left discovery is one predicate-pushed scan of the fact
table semi-joined against the (small, broadcast) changed-key set. Both
sides' snapshots are read CURRENT: a batch may therefore see the other
side slightly ahead of its stream position, but every commit also
feeds the stream, so the keys it touched are re-derived again when its
feed batch arrives — after a drain the MV equals σ(left) ⋈ right of the
final snapshots exactly (the convergence contract the tests and the
``join_mv_state`` driver oracle pin).

Consistency: per-key eventual, exact after drain — the MV is a
cache of the join, not a transactional multi-table snapshot (the same
contract Delta materialized views and DBSP-style IVM engines ship with
default read isolation).

Reference analog: the deidentification flow's identity-dimension join
(``DeidentifyDICOM.java`` joining instances against the controller's
identity table) run CONTINUOUSLY instead of per-flow-file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_dicom_spark.lake.snapshot_table import SnapshotTable
from nifi_dicom_spark.sources.table_stream import SnapshotCDFDataSource

_VERSION_COLS = ("op", "op_seq", "offset")


def _payload_fields(table: SnapshotTable) -> list[T.StructField]:
    """Visible payload: the table's schema minus version bookkeeping."""
    return [f for f in table.schema().fields if f.name not in _VERSION_COLS]


def _visible(table: SnapshotTable, version: int | None = None) -> DataFrame:
    df = table.read(version=version)
    if "op" in df.columns:
        df = df.filter(F.col("op") != "delete")
    return df.select(*[f.name for f in _payload_fields(table)])


def create_join_mv(
    spark: SparkSession,
    path: str,
    left: SnapshotTable,
    right: SnapshotTable,
    on: list[str],
    how: str = "inner",
    n_buckets: int | None = None,
) -> SnapshotTable:
    """An empty versioned MV table for ``left ⋈ right ON on``: keyed by
    the LEFT table's keys, columns = left payload + right payload (minus
    the join columns, which left already carries), join spec pinned in
    table props so maintenance against a differently-spec'd MV fails
    loudly (the rollup's pct-spec pattern)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if list(right.key_cols()) != list(on):
        raise ValueError(
            f"enrichment join requires the right table's key columns to BE "
            f"the join columns (right keys {right.key_cols()}, on {on}); "
            "many-to-many joins are out of scope"
        )
    lfields = _payload_fields(left)
    lnames = [f.name for f in lfields]
    missing = [c for c in on if c not in lnames]
    if missing:
        raise ValueError(f"join column(s) {missing} not in left table {lnames}")
    rfields = [f for f in _payload_fields(right) if f.name not in on]
    clash = sorted({f.name for f in rfields} & set(lnames))
    if clash:
        raise ValueError(
            f"right payload column(s) {clash} collide with left columns; "
            "rename upstream (the MV is one flat row per left key)"
        )
    fields = list(lfields)
    # right payload is nullable in the MV: how='left' misses null-fill it,
    # and how='inner' never stores a miss at all
    fields += [T.StructField(f.name, f.dataType, True) for f in rfields]
    fields += [
        T.StructField("op", T.StringType(), True),
        T.StructField("op_seq", T.LongType(), False),
        T.StructField("offset", T.LongType(), False),
    ]
    return SnapshotTable.create(
        spark,
        path,
        T.StructType(fields),
        key_cols=list(left.key_cols()),
        n_buckets=n_buckets or left.n_buckets(),
        props={
            "join_on": list(on),
            "join_how": how,
            "join_left_path": left.path,
            "join_right_path": right.path,
        },
    )


def _join_spec(mv: SnapshotTable) -> tuple[list[str], str]:
    props = mv.manifest().get("props", {})
    on, how = props.get("join_on"), props.get("join_how")
    if not on or how not in ("inner", "left"):
        raise ValueError(
            "table was not created by create_join_mv (missing/invalid "
            "join_on/join_how props)"
        )
    return list(on), how


def _recompute_keys(
    mv: SnapshotTable,
    left: SnapshotTable,
    right: SnapshotTable,
    touched_left_keys: DataFrame,
    touched_join_keys: DataFrame,
    seq: int,
) -> None:
    """Re-derive the MV rows for the touched left keys from the current
    snapshots and merge them (vanished keys become tombstones)."""
    on, how = _join_spec(mv)
    lkeys = list(left.key_cols())
    lstate = _visible(left)
    relevant = (
        lstate.join(F.broadcast(touched_left_keys), lkeys, "left_semi")
        .unionByName(
            lstate.join(F.broadcast(touched_join_keys), on, "left_semi")
        )
        .dropDuplicates(lkeys)
    )
    rpay = [f.name for f in _payload_fields(right) if f.name not in on]
    joined = relevant.join(_visible(right).select(*on, *rpay), on, how)
    # every touched key re-derives: present in the join → fresh row;
    # absent (left row deleted, or inner-join match lost) → tombstone
    all_touched = touched_left_keys.unionByName(
        relevant.select(*lkeys)
    ).dropDuplicates(lkeys)
    dead = all_touched.join(joined.select(*lkeys), lkeys, "left_anti")
    mv_payload = [f.name for f in _payload_fields(mv)]
    fresh = joined.select(
        *mv_payload,
        F.lit("update").alias("op"),
        F.lit(seq).cast("long").alias("op_seq"),
        F.lit(seq).cast("long").alias("offset"),
    )
    schema = mv.schema()
    tomb = dead.select(
        *[
            F.col(c).alias(c)
            if c in lkeys
            else F.lit(None).cast(schema[c].dataType).alias(c)
            for c in mv_payload
        ],
        F.lit("delete").alias("op"),
        F.lit(seq).cast("long").alias("op_seq"),
        F.lit(seq).cast("long").alias("offset"),
    )
    mv.merge(
        fresh.unionByName(tomb),
        op_col="op",
        policy="versioned_upsert",
        commit_keys=[(seq, 0)],
    )


def backfill_join_mv(
    mv: SnapshotTable, left: SnapshotTable, right: SnapshotTable
) -> tuple[int, int]:
    """Seed an EMPTY MV with the full σ(left) ⋈ right at the current
    versions and return ``(left_version, right_version)`` — pass them as
    ``join_mv_stream(starting_versions=...)`` so each feed begins exactly
    where the seeding snapshots ended (the :func:`.rollup.backfill_rollup`
    recovery contract, per side)."""
    m = mv.manifest()
    if m.get("files") or m.get("delta_files"):
        raise ValueError("backfill_join_mv requires an empty MV table")
    on, how = _join_spec(mv)
    lv, rv = left.current_version(), right.current_version()
    rpay = [f.name for f in _payload_fields(right) if f.name not in on]
    joined = _visible(left, lv).join(
        _visible(right, rv).select(*on, *rpay), on, how
    )
    mv_payload = [f.name for f in _payload_fields(mv)]
    seed = joined.select(
        *mv_payload,
        F.lit("insert").alias("op"),
        F.lit(0).cast("long").alias("op_seq"),
        F.lit(0).cast("long").alias("offset"),
    )
    mv.merge(seed, op_col="op", policy="versioned_upsert", commit_keys=[(0, 0)])
    return lv, rv


def join_mv_stream(
    spark: SparkSession,
    left: SnapshotTable,
    right: SnapshotTable,
    mv: SnapshotTable,
    checkpoint: str,
    starting_versions: tuple[int, int] | None = None,
    trigger_interval: str = "1 second",
):
    """Start (and return) the streaming query maintaining ``mv``. Stop via
    ``query.stop()``; restarting with the same ``checkpoint`` resumes
    exactly-once (each feed's offsets live in the checkpoint; applied
    batches are ledger no-ops).

    ONE query over BOTH feeds: each side projects to the common
    touched-key schema (side tag + left keys, null on the right side +
    join columns) and unions — the batch then carries exactly the
    information maintenance needs, never payload bytes."""
    on, _how = _join_spec(mv)
    lkeys = list(left.key_cols())
    spark.dataSource.register(SnapshotCDFDataSource)

    def feed(table: SnapshotTable, sv: int | None):
        r = spark.readStream.format("snapshot_cdf").option("path", table.path)
        if sv is not None:
            r = r.option("startingVersion", sv)
        return r.load()

    lf, rf = (
        feed(left, starting_versions[0] if starting_versions else None),
        feed(right, starting_versions[1] if starting_versions else None),
    )
    lschema = left.schema()
    lproj = lf.select(
        F.lit("L").alias("_side"),
        *[F.col(c) for c in lkeys],
        *[F.col(c) for c in on if c not in lkeys],
    )
    rproj = rf.select(
        F.lit("R").alias("_side"),
        *[
            F.lit(None).cast(lschema[c].dataType).alias(c)
            for c in lkeys
            if c not in on
        ],
        *[F.col(c) for c in on],
    )
    # align column order for the union (sets are identical by construction)
    rproj = rproj.select(*lproj.columns)
    union = lproj.unionByName(rproj)

    def apply_batch(batch_df, batch_id: int) -> None:
        touched_left = (
            batch_df.filter(F.col("_side") == "L").select(*lkeys).dropDuplicates()
        )
        touched_jk = (
            batch_df.filter(F.col("_side") == "R").select(*on).dropDuplicates()
        )
        if not touched_left.limit(1).count() and not touched_jk.limit(1).count():
            return
        # op_seq = batch_id + 1: monotonic per checkpoint and deterministic
        # under replay; the two sides' commit versions are INDEPENDENT
        # counters, so (unlike the single-source rollup) the covered commit
        # version cannot serve as the LWW sequence. +1 keeps every streamed
        # batch above the backfill seed's op_seq=0.
        _recompute_keys(mv, left, right, touched_left, touched_jk, int(batch_id) + 1)

    return (
        union.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=trigger_interval)
        .start()
    )
