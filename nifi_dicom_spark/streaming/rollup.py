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
decrements the old group, the postimage increments the new one.

MIN/MAX are NOT decrementable; they get a hybrid arm (``max_cols`` /
``min_cols``): arrivals maintain the extremum incrementally via
``greatest``/``least``, and only a departure that TIES the stored extremum
triggers a recompute of that group from the source snapshot at the batch's
covered version — the reference's per-study max-insertion-time pattern
(``StudyReceiver.updateStudyMostRecentInsertionTime``, re-derive on
change) bounded to the groups that actually lost their extremum.

DISTINCT COUNTS (``hll_cols``) get the same hybrid treatment with Spark's
built-in Datasketches HLL: arrivals are UNION-monotone (``hll_union`` of
the stored sketch with the batch's ``hll_sketch_agg``), and only a
departure whose value does NOT re-arrive in the same group in the same
batch can have removed that value's last copy — exactly those groups
recompute their sketch from the source snapshot. The table stores the
sketch (``hll_<c>``, binary) plus its estimate (``dv_<c>``, long —
Datasketches is exact at small per-group cardinality and ~±2% at 10^6
with the default lgK=12, recorded in the table's ``props['hll_lgk']`` so
every maintenance path unions compatible sketches).

PERCENTILES (``pct_cols``) are neither incrementable nor decrementable —
no mergeable-and-subtractable summary exists — so they take the recompute
arm UNCONDITIONALLY: every touched group re-derives its percentiles from
the source snapshot at the batch's covered version (exact interpolated
``percentile``, the ``quantile_cont`` definition). Untouched groups pay
nothing. Because a pct batch already scans the touched groups' source
rows, the MIN/MAX/HLL recomputes fold into that same scan for free (the
recompute flag goes unconditional for all families when ``pct_cols`` is
present — one predicate-pushed scan, every family re-derived exactly).

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

__all__ = ["backfill_rollup", "create_rollup_table", "refresh_rollup", "rollup_stream"]

_VERSION_COLS = ("op", "op_seq", "offset")


def _pct_name(c: str, q: float) -> str:
    """Column name for quantile ``q`` of source column ``c``: p50_value,
    p99_9_latency. Validates q in (0, 1)."""
    if not (0.0 < float(q) < 1.0):
        raise ValueError(f"percentile must be in (0, 1), got {q}")
    return f"p{float(q) * 100:g}".replace(".", "_") + f"_{c}"


def _pct_items(pct_cols: dict[str, list[float]] | None) -> list[tuple[str, float, str]]:
    """Normalize ``pct_cols`` ({source col: [quantiles]}) to a flat,
    deterministic (col, q, output name) list; rejects duplicate output
    names (q=0.5 given twice, or two q values formatting identically)."""
    items = [
        (c, float(q), _pct_name(c, q))
        for c, qs in sorted((pct_cols or {}).items())
        for q in sorted(qs)
    ]
    names = [n for _, _, n in items]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate percentile columns in pct_cols: {names}")
    return items


def create_rollup_table(
    spark: SparkSession,
    path: str,
    source: SnapshotTable,
    group_cols: list[str],
    sum_cols: list[str] | None = None,
    n_buckets: int = 8,
    max_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    hll_cols: list[str] | None = None,
    hll_lgk: int = 12,
    pct_cols: dict[str, list[float]] | None = None,
) -> SnapshotTable:
    """An empty rollup table keyed by ``group_cols`` with a ``n_rows``
    count, one ``sum_<c>`` per ``sum_cols`` entry (all doubles), one
    ``max_<c>`` / ``min_<c>`` per ``max_cols`` / ``min_cols`` entry
    (source dtype — MAX of a timestamp is a timestamp), one
    ``hll_<c>`` (Datasketches HLL sketch, binary) + ``dv_<c>`` (its
    distinct-count estimate, long) per ``hll_cols`` entry, and one
    ``p<q>_<c>`` double per quantile in ``pct_cols`` (``{"value": [0.5,
    0.999]}`` → ``p50_value``, ``p99_9_value``), plus the engine's
    version bookkeeping. MIN/MAX and distinct counts are
    non-decrementable: deletes that might remove the extremum / a value's
    last copy trigger a recompute of the touched groups from the source
    snapshot; percentiles recompute on EVERY touch (see
    :func:`rollup_stream`). ``hll_lgk`` (Datasketches lgConfigK, 4..21)
    sizes the sketches and is recorded in the table's props — every later
    union must (and automatically does) use it."""
    sum_cols = list(sum_cols or [])
    max_cols = list(max_cols or [])
    min_cols = list(min_cols or [])
    hll_cols = list(hll_cols or [])
    pct_items = _pct_items(pct_cols)
    if hll_cols and not (4 <= int(hll_lgk) <= 21):
        raise ValueError(f"hll_lgk must be in 4..21 (got {hll_lgk})")
    src = source.schema()
    names = {f.name: f for f in src.fields}
    missing = [
        c
        for c in (
            *group_cols,
            *sum_cols,
            *max_cols,
            *min_cols,
            *hll_cols,
            *(c for c, _, _ in pct_items),
        )
        if c not in names
    ]
    if missing:
        raise ValueError(f"rollup columns not in source schema: {missing}")
    bad = sorted(set(group_cols) & set(_VERSION_COLS))
    if bad:
        raise ValueError(f"group cols collide with version bookkeeping: {bad}")
    fields = [T.StructField(c, names[c].dataType, True) for c in group_cols]
    fields.append(T.StructField("n_rows", T.LongType(), True))
    fields += [T.StructField(f"sum_{c}", T.DoubleType(), True) for c in sum_cols]
    fields += [
        T.StructField(f"max_{c}", names[c].dataType, True) for c in max_cols
    ]
    fields += [
        T.StructField(f"min_{c}", names[c].dataType, True) for c in min_cols
    ]
    for c in hll_cols:
        fields.append(T.StructField(f"hll_{c}", T.BinaryType(), True))
        fields.append(T.StructField(f"dv_{c}", T.LongType(), True))
    fields += [T.StructField(n, T.DoubleType(), True) for _, _, n in pct_items]
    fields += [
        T.StructField("op", T.StringType(), True),
        T.StructField("op_seq", T.LongType(), False),
        T.StructField("offset", T.LongType(), False),
    ]
    props: dict = {}
    if hll_cols:
        props["hll_lgk"] = int(hll_lgk)
    if pct_items:
        # the quantile VALUES live in props (column names round q through
        # %g formatting); validation and the maintenance paths read them
        # back so a stream can't silently maintain different quantiles
        props["pct_cols"] = {c: sorted(float(q) for q in qs) for c, qs in pct_cols.items()}
    return SnapshotTable.create(
        spark,
        path,
        T.StructType(fields),
        key_cols=list(group_cols),
        n_buckets=n_buckets,
        props=props or None,
    )


def backfill_rollup(
    rollup: SnapshotTable,
    source: SnapshotTable,
    sum_cols: list[str] | None = None,
    version: int | None = None,
    max_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    hll_cols: list[str] | None = None,
    pct_cols: dict[str, list[float]] | None = None,
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
    max_cols = list(max_cols or [])
    min_cols = list(min_cols or [])
    hll_cols = list(hll_cols or [])
    pct_items = _pct_items(pct_cols)
    # the seed must cover the table's aggregate columns exactly: an omitted
    # column seeds NULL, and every later stream/refresh batch would build
    # on that null (the same silent-subset hole _validate_agg_cols closes
    # for the maintenance paths)
    _validate_agg_cols(rollup, sum_cols, max_cols, min_cols, hll_cols, pct_cols)
    lgk = _hll_lgk(rollup)
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
        *[F.max(c).alias(f"max_{c}") for c in max_cols],
        *[F.min(c).alias(f"min_{c}") for c in min_cols],
        *[
            F.hll_sketch_agg(F.col(c), F.lit(lgk)).alias(f"hll_{c}")
            for c in hll_cols
        ],
        *[
            F.percentile(F.col(c).cast("double"), F.lit(q)).alias(n)
            for c, q, n in pct_items
        ],
    ).select(
        *group_cols,
        "n_rows",
        *[f"sum_{c}" for c in sum_cols],
        *[f"max_{c}" for c in max_cols],
        *[f"min_{c}" for c in min_cols],
        *[
            e
            for c in hll_cols
            for e in (
                F.col(f"hll_{c}"),
                F.coalesce(
                    F.hll_sketch_estimate(F.col(f"hll_{c}")), F.lit(0)
                ).alias(f"dv_{c}"),
            )
        ],
        *[n for _, _, n in pct_items],
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
    max_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    hll_cols: list[str] | None = None,
    pct_cols: dict[str, list[float]] | None = None,
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
    max_cols = list(max_cols or [])
    min_cols = list(min_cols or [])
    hll_cols = list(hll_cols or [])
    pct_cols = dict(pct_cols or {})
    if list(group_cols) != rollup.key_cols():
        # bucket placement and the LWW merge are keyed by the TABLE's key
        # columns; a differing/reordered group list would prune the wrong
        # buckets and silently overwrite accumulated totals with
        # delta-only rows — reject instead
        raise ValueError(
            f"group_cols {list(group_cols)} must equal the rollup table's "
            f"key columns {rollup.key_cols()}"
        )
    _validate_agg_cols(rollup, sum_cols, max_cols, min_cols, hll_cols, pct_cols)
    src_table = (
        SnapshotTable.load(spark, source_path)
        if (max_cols or min_cols or hll_cols or pct_cols)
        else None
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

    def apply_batch(batch_df, batch_id: int) -> None:
        _apply_cdf_images(
            rollup,
            batch_df,
            group_cols,
            sum_cols,
            commit_keys=[(int(batch_id), 0)],
            source=src_table,
            max_cols=max_cols,
            min_cols=min_cols,
            hll_cols=hll_cols,
            pct_cols=pct_cols,
        )

    return (
        feed.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=trigger_interval)
        .start()
    )


def _apply_cdf_images(
    rollup: SnapshotTable,
    batch_df,
    group_cols: list[str],
    sum_cols: list[str],
    commit_keys: list[tuple[int, int]] | None,
    source: SnapshotTable | None = None,
    max_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    hll_cols: list[str] | None = None,
    pct_cols: dict[str, list[float]] | None = None,
) -> None:
    """Apply one batch of CDF images (``_change_type`` + payload rows) to
    the rollup via the signed-delta read-modify-write — the shared core of
    the streaming path (:func:`rollup_stream`) and the batch refresh
    (:func:`refresh_rollup`).

    MIN/MAX (non-decrementable) arm: arrivals maintain the extremum
    incrementally (``greatest(stored, incoming)``), but a DEPARTURE
    (delete / update_preimage) whose value ties the stored extremum may
    have been the last row holding it — those groups are RECOMPUTED from
    the source snapshot at the batch's covered version (reference analog:
    ``StudyReceiver.updateStudyMostRecentInsertionTime`` re-derives the
    study max on arrivals; deletes force the full re-derivation). Cost:
    a predicate-pushed source scan restricted to the recomputed groups —
    only groups that lost their extremum pay it, arrivals stay O(delta).

    DISTINCT-COUNT (``hll_cols``) arm, same hybrid shape: arrivals
    ``hll_union`` into the stored sketch (union-monotone, O(delta)); a
    departure whose value does NOT also arrive in the same group in this
    batch may have removed that value's last copy, so exactly those
    groups recompute their sketch from the source snapshot. The
    departure-covered check is per-batch set arithmetic
    (``array_except`` of the group's departing vs arriving value sets),
    O(delta) like everything else on the incremental path.

    PERCENTILE (``pct_cols``) arm: no incremental form exists, so EVERY
    touched group recomputes its quantiles from the snapshot — the
    recompute flag goes unconditional, which also folds the MIN/MAX/HLL
    re-derivations into the same single predicate-pushed scan (cheaper
    than running their incremental arms alongside a scan that already
    covers them)."""
    max_cols = list(max_cols or [])
    min_cols = list(min_cols or [])
    hll_cols = list(hll_cols or [])
    pct_items = _pct_items(pct_cols)
    if (max_cols or min_cols or hll_cols or pct_items) and source is None:
        raise ValueError(
            "max_cols/min_cols/hll_cols/pct_cols require the source table "
            "(recompute arm)"
        )
    lgk = _hll_lgk(rollup) if hll_cols else 12
    known = ("insert", "update_preimage", "update_postimage", "delete")
    sign = (
        F.when(F.col("_change_type").isin("insert", "update_postimage"), F.lit(1))
        .when(F.col("_change_type").isin("delete", "update_preimage"), F.lit(-1))
    )
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
    # arrivals' extrema (incremental candidates) and departures' extrema
    # (recompute triggers) per group, computed in the same single pass
    aggs += [
        F.max(F.when(sign > 0, F.col(c))).alias(f"_imax_{c}") for c in max_cols
    ]
    aggs += [
        F.max(F.when(sign < 0, F.col(c))).alias(f"_dmax_{c}") for c in max_cols
    ]
    aggs += [
        F.min(F.when(sign > 0, F.col(c))).alias(f"_imin_{c}") for c in min_cols
    ]
    aggs += [
        F.min(F.when(sign < 0, F.col(c))).alias(f"_dmin_{c}") for c in min_cols
    ]
    # arrivals' sketch (union candidate — an all-departure group yields the
    # EMPTY sketch, the union identity, never null) plus the per-group
    # departing/arriving value sets for the covered-departure check
    aggs += [
        F.hll_sketch_agg(F.when(sign > 0, F.col(c)), F.lit(lgk)).alias(f"_ihll_{c}")
        for c in hll_cols
    ]
    aggs += [
        F.collect_set(F.when(sign < 0, F.col(c))).alias(f"_dvals_{c}")
        for c in hll_cols
    ]
    aggs += [
        F.collect_set(F.when(sign > 0, F.col(c))).alias(f"_avals_{c}")
        for c in hll_cols
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
        *[F.col(f"max_{c}") for c in max_cols],
        *[F.col(f"min_{c}") for c in min_cols],
        *[F.col(f"hll_{c}") for c in hll_cols],
        *[F.col(n) for _, _, n in pct_items],
    ).join(delta, on=group_cols, how="full_outer")
    new_n = F.coalesce(F.col("n_rows"), F.lit(0)) + F.coalesce(
        F.col("_d_n"), F.lit(0)
    )
    # a departure can only have removed the stored extremum if it TIES it
    # (>= / <=); strictly-inside departures leave the extremum standing and
    # stay on the O(delta) incremental path
    needs_rc = F.lit(False)
    for c in max_cols:
        needs_rc = needs_rc | (
            F.col(f"_dmax_{c}").isNotNull()
            & (F.col(f"max_{c}").isNull() | (F.col(f"_dmax_{c}") >= F.col(f"max_{c}")))
        )
    for c in min_cols:
        needs_rc = needs_rc | (
            F.col(f"_dmin_{c}").isNotNull()
            & (F.col(f"min_{c}").isNull() | (F.col(f"_dmin_{c}") <= F.col(f"min_{c}")))
        )
    for c in hll_cols:
        # a departing value with no same-batch arrival of the SAME value in
        # this group may have been its last copy — sketches can't subtract,
        # so those groups re-derive from the snapshot
        needs_rc = needs_rc | (
            F.size(
                F.array_except(F.col(f"_dvals_{c}"), F.col(f"_avals_{c}"))
            )
            > 0
        )
    if pct_items:
        # percentiles have no incremental form: every touched group
        # recomputes — and since that scan covers the group's rows anyway,
        # max/min/hll ride along on the unconditional flag
        needs_rc = F.lit(True)
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
        *[
            F.greatest(F.col(f"max_{c}"), F.col(f"_imax_{c}")).alias(f"max_{c}")
            for c in max_cols
        ],
        *[
            F.least(F.col(f"min_{c}"), F.col(f"_imin_{c}")).alias(f"min_{c}")
            for c in min_cols
        ],
        *[
            # new group: arrivals' sketch stands alone (hll_union is not
            # null-tolerant); otherwise union — the arrivals sketch is
            # never null (empty sketch = identity), so no other arm needed
            F.when(F.col(f"hll_{c}").isNull(), F.col(f"_ihll_{c}"))
            .otherwise(F.hll_union(F.col(f"hll_{c}"), F.col(f"_ihll_{c}")))
            .alias(f"hll_{c}")
            for c in hll_cols
        ],
        # stored percentiles carried through so tombstones keep the column;
        # every live row is overwritten by the recompute below
        *[F.col(n) for _, _, n in pct_items],
        (needs_rc & (new_n > 0)).alias("_needs_rc"),
        F.when(new_n <= 0, "delete").otherwise("update").alias("op"),
        F.lit(seq).alias("op_seq"),
        F.lit(seq).alias("offset"),
    )
    for c in hll_cols:
        ev = ev.withColumn(
            f"dv_{c}",
            F.coalesce(F.hll_sketch_estimate(F.col(f"hll_{c}")), F.lit(0)),
        )
    if max_cols or min_cols or hll_cols or pct_items:
        # recompute arm: re-derive the extrema of flagged groups from the
        # source state AS OF the batch's covered version (exactly the
        # post-batch state — later commits belong to later batches)
        ev_c = ev.cache()  # consumed twice (flag split); bounded by touched groups
        try:
            ev = ev_c
            rc_keys = ev.filter(F.col("_needs_rc")).select(*group_cols)
            if rc_keys.limit(1).count():
                state = source.read(version=seq)
                if "op" in state.columns:
                    state = state.filter(F.col("op") != "delete")
                rc = (
                    state.join(
                        F.broadcast(rc_keys), on=group_cols, how="left_semi"
                    )
                    .groupBy(*group_cols)
                    .agg(
                        *[F.max(c).alias(f"_rc_max_{c}") for c in max_cols],
                        *[F.min(c).alias(f"_rc_min_{c}") for c in min_cols],
                        *[
                            F.hll_sketch_agg(F.col(c), F.lit(lgk)).alias(
                                f"_rc_hll_{c}"
                            )
                            for c in hll_cols
                        ],
                        *[
                            F.percentile(
                                F.col(c).cast("double"), F.lit(q)
                            ).alias(f"_rc_{n}")
                            for c, q, n in pct_items
                        ],
                    )
                )
                ev = ev.join(rc, on=group_cols, how="left").select(
                    *group_cols,
                    "n_rows",
                    *[f"sum_{c}" for c in sum_cols],
                    *[
                        F.when(F.col("_needs_rc"), F.col(f"_rc_max_{c}"))
                        .otherwise(F.col(f"max_{c}"))
                        .alias(f"max_{c}")
                        for c in max_cols
                    ],
                    *[
                        F.when(F.col("_needs_rc"), F.col(f"_rc_min_{c}"))
                        .otherwise(F.col(f"min_{c}"))
                        .alias(f"min_{c}")
                        for c in min_cols
                    ],
                    *[
                        e
                        for c in hll_cols
                        for e in (
                            F.when(F.col("_needs_rc"), F.col(f"_rc_hll_{c}"))
                            .otherwise(F.col(f"hll_{c}"))
                            .alias(f"hll_{c}"),
                            F.when(
                                F.col("_needs_rc"),
                                F.coalesce(
                                    F.hll_sketch_estimate(F.col(f"_rc_hll_{c}")),
                                    F.lit(0),
                                ),
                            )
                            .otherwise(F.col(f"dv_{c}"))
                            .alias(f"dv_{c}"),
                        )
                    ],
                    *[
                        F.when(F.col("_needs_rc"), F.col(f"_rc_{n}"))
                        .otherwise(F.col(n))
                        .alias(n)
                        for _, _, n in pct_items
                    ],
                    "op",
                    "op_seq",
                    "offset",
                )
            else:
                ev = ev.drop("_needs_rc")
            rollup.merge(
                ev, op_col="op", policy="versioned_upsert", commit_keys=commit_keys
            )
        finally:
            ev_c.unpersist()
    else:
        ev = ev.drop("_needs_rc")
        rollup.merge(ev, op_col="op", policy="versioned_upsert", commit_keys=commit_keys)


def _hll_lgk(rollup: SnapshotTable) -> int:
    """The table's Datasketches lgConfigK (recorded at creation). Sketch
    unions require matching lgK; reading it from the table's props removes
    the mismatched-parameter footgun across backfill/stream/refresh."""
    return int((rollup.manifest().get("props") or {}).get("hll_lgk", 12))


def _validate_agg_cols(
    rollup: SnapshotTable,
    sum_cols: list[str],
    max_cols: list[str],
    min_cols: list[str],
    hll_cols: list[str] | None = None,
    pct_cols: dict[str, list[float]] | None = None,
) -> None:
    """Require the requested aggregate columns to cover the rollup table's
    ``sum_*/max_*/min_*/hll_*`` (and percentile) columns EXACTLY (not a
    subset): the LWW merge conforms missing columns to null, so maintaining
    FEWER aggregate cols than the table carries would silently null the
    omitted totals for every touched group. Shared by :func:`rollup_stream`
    and :func:`refresh_rollup` — both write through the same merge.
    Percentiles are validated against the table's ``props['pct_cols']``
    (quantile VALUES, not just column names — maintaining p90 against a
    table created for p50 must fail loudly, not write p90 into p50)."""
    hll_cols = list(hll_cols or [])
    table_pct = (rollup.manifest().get("props") or {}).get("pct_cols") or {}
    want_pct = {c: sorted(float(q) for q in qs) for c, qs in (pct_cols or {}).items()}
    have_pct = {c: sorted(float(q) for q in qs) for c, qs in table_pct.items()}
    if want_pct != have_pct:
        raise ValueError(
            f"pct_cols {want_pct} must equal the rollup table's percentile "
            f"spec exactly ({have_pct}): omitted columns would be "
            "overwritten with null, and a different quantile would be "
            "silently written into the existing column"
        )
    have = set(rollup.schema().fieldNames())
    need = {
        "n_rows",
        *(f"sum_{c}" for c in sum_cols),
        *(f"max_{c}" for c in max_cols),
        *(f"min_{c}" for c in min_cols),
        *(f"hll_{c}" for c in hll_cols),
        *(f"dv_{c}" for c in hll_cols),
    }
    if not need <= have:
        raise ValueError(
            f"rollup table lacks aggregate column(s) {sorted(need - have)}; "
            "create it with create_rollup_table(..., sum_cols=...)"
        )
    keys = set(rollup.key_cols())
    for pfx, req in (
        ("sum_", sum_cols),
        ("max_", max_cols),
        ("min_", min_cols),
        ("hll_", hll_cols),
        ("dv_", hll_cols),
    ):
        table_aggs = {f for f in have if f.startswith(pfx) and f not in keys}
        if {f"{pfx}{c}" for c in req} != table_aggs:
            raise ValueError(
                f"{pfx.rstrip('_')}_cols {sorted(req)} must cover the rollup "
                f"table's aggregate columns exactly ({sorted(table_aggs)}): "
                "omitted columns would be overwritten with null on every "
                "touched group"
            )


def refresh_rollup(
    rollup: SnapshotTable,
    source: SnapshotTable,
    from_version: int,
    sum_cols: list[str] | None = None,
    commit_keys: list[tuple[int, int]] | None = None,
    max_cols: list[str] | None = None,
    min_cols: list[str] | None = None,
    hll_cols: list[str] | None = None,
    pct_cols: dict[str, list[float]] | None = None,
) -> None:
    """Batch (pull) refresh: apply ``source``'s change feed AFTER
    ``from_version`` to the rollup in one signed-delta pass — the same
    maintenance arithmetic as :func:`rollup_stream`, for callers that
    refresh on demand instead of tailing continuously (materialized-view
    REFRESH). Pair with :func:`backfill_rollup`: seed at version v, then
    ``refresh_rollup(..., from_version=v)`` covers everything exactly once.

    ``commit_keys`` makes the refresh replay-safe under the rollup's
    ledger; it shares the (epoch, partition) namespace with a
    ``rollup_stream`` checkpoint's batch ids, so don't mix ledgered
    refreshes and a stream on one rollup without a disjoint numbering.
    Default None = unledgered merge (caller owns idempotency, like
    :func:`backfill_rollup`)."""
    from nifi_dicom_spark.operators.diff import change_feed

    sum_cols = list(sum_cols or [])
    max_cols = list(max_cols or [])
    min_cols = list(min_cols or [])
    hll_cols = list(hll_cols or [])
    pct_cols = dict(pct_cols or {})
    # same coverage contract as rollup_stream: a refresh that omits an
    # aggregate column the table carries would null it for every touched
    # group through the LWW merge
    _validate_agg_cols(rollup, sum_cols, max_cols, min_cols, hll_cols, pct_cols)
    if int(source.current_version()) == int(from_version):
        return  # nothing committed since the seed
    feed = change_feed(source, from_version=int(from_version))
    _apply_cdf_images(
        rollup,
        feed,
        rollup.key_cols(),
        sum_cols,
        commit_keys=commit_keys,
        source=source,
        max_cols=max_cols,
        min_cols=min_cols,
        hll_cols=hll_cols,
        pct_cols=pct_cols,
    )
