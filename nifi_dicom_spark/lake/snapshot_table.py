"""SnapshotTable — a from-scratch, Iceberg-style lake table on parquet.

No Iceberg/Delta jar ships in this environment, so the engine provides its own
minimal table format with the four properties the CDC sink needs (the same
properties the reference gets from its embedded SQL engine — HSQLDB/Derby
``MERGE INTO`` at ``DeidentificationController.java:108-123`` and
insert-if-absent at ``DatabaseInformationModel.java:805-892``):

1. **Snapshot isolation + time travel.** Every commit writes an immutable
   manifest ``meta/v{N}.json`` listing the data files of that version; readers
   pin a manifest, writers CAS the ``meta/CURRENT`` pointer. Readers never see
   partial commits.
2. **MERGE semantics.** ``merge()`` implements
   ``WHEN MATCHED [AND op='delete'] THEN DELETE / UPDATE, WHEN NOT MATCHED
   THEN INSERT`` via copy-on-write of only the *touched* key-buckets.
3. **Idempotent commits.** Application-level commit keys
   ``(checkpoint_epoch, partition_id)`` are recorded in the manifest
   atomically with the data — re-applying an epoch after a crash/restart is a
   detected no-op (exactly-once; SURVEY §2.9 T5).
4. **Schema evolution.** The manifest carries the table schema; merges with
   new/widened columns evolve it (ADD COLUMN analog of
   ``DatabaseInformationModel.java:672-698``); old files are read through the
   evolved schema (missing columns → nulls).

Scale design: data is hash-bucketed by the merge key's first column
(``pmod(xxhash64(conv_id), n_buckets)``), so a merge touches only buckets the
source contains — merge cost scales with the change set, not table size. On a
1000-executor cluster the same layout gives (a) bucket-pruned merges,
(b) shuffle-free co-location of target-vs-source by making both sides
partition on the same bucket function, and (c) a natural unit for compaction.
If an Iceberg runtime jar is present, :func:`iceberg_available` lets callers
swap in real ``MERGE INTO`` — the operator API is identical.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_dicom_spark.operators.reconcile import conform_to_schema, evolve_schema


class CommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic concurrency)."""


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018
        return True
    except Exception:
        return False


@dataclass
class MergeStats:
    version: int
    touched_buckets: int
    skipped_commit_keys: int
    applied: bool


def _bucket_expr(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


#: n_buckets -> [preimage long per bucket]; process-wide (pure function of n)
_PK_CACHE: dict[int, list[int]] = {}


def _partition_preimages(spark: SparkSession, n: int) -> list[int]:
    """``pk[b]`` = a long ``x`` with ``pmod(murmur3_hash(x), n) == b``.

    ``repartition(n, pk_col)`` places rows in shuffle partition
    ``pmod(murmur3(pk), n)``, so tagging bucket ``b``'s rows with ``pk[b]``
    sends each bucket to exactly one output partition — partition index ==
    bucket id. This replaces the dynamic-partition writer
    (``write.partitionBy``), which adds its own sort + per-directory commit
    and measurably anti-scales with executor count, with a plain columnar
    write of one file per bucket. One tiny Spark job per distinct ``n`` per
    process (cached); runs during table setup/warm-up, not per epoch.
    """
    pks = _PK_CACHE.get(n)
    if pks is None:
        rows = (
            spark.range(0, max(4096, 64 * n))
            .select(F.col("id"), F.pmod(F.hash(F.col("id")), F.lit(n)).alias("b"))
            .groupBy("b")
            .agg(F.min("id").alias("pk"))
            .collect()
        )
        got = {r["b"]: r["pk"] for r in rows}
        missing = [b for b in range(n) if b not in got]
        if missing:  # astronomically unlikely for the search range above
            raise RuntimeError(f"no murmur3 preimage found for buckets {missing}")
        pks = [got[b] for b in range(n)]
        _PK_CACHE[n] = pks
    return pks


class SnapshotTable:
    """Versioned, bucketed parquet table with MERGE + idempotent commits."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.meta_dir = os.path.join(path, "meta")
        self.data_dir = os.path.join(path, "data")

    # ------------------------------------------------------------------ DDL

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_cols: list[str],
        n_buckets: int = 16,
        props: dict[str, Any] | None = None,
    ) -> "SnapshotTable":
        t = cls(spark, path)
        os.makedirs(t.meta_dir, exist_ok=False)
        os.makedirs(t.data_dir, exist_ok=True)
        manifest = {
            "version": 0,
            "parent": None,
            "schema": schema.json(),
            "key_cols": key_cols,
            "n_buckets": n_buckets,
            "files": {},  # bucket(str) -> [relpath]
            "applied_keys": [],
            "props": props or {},
            "summary": {"operation": "create"},
        }
        t._write_manifest(manifest)
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SnapshotTable":
        t = cls(spark, path)
        t.current_version()  # validates existence
        # same age guard as the commit path: a reader loading while a writer
        # is between _write_manifest and the CURRENT flip must not delete the
        # writer's fresh manifest (that would wedge the table permanently)
        t._repair_orphans(min_age_s=10.0)
        return t

    def _repair_orphans(self, min_age_s: float = 0.0) -> int:
        """Remove manifest files ahead of CURRENT.

        A writer that dies between creating ``v{N}.json`` and flipping
        ``CURRENT`` leaves an orphan that would make every future commit of
        version N fail its O_EXCL create (a permanently wedged table). At
        ``load()`` time (no writer active — the table is single-writer: one
        streaming query owns the sink) any manifest beyond CURRENT is
        known-dead. In the commit path an age guard (``min_age_s``) protects
        a hypothetical concurrent writer mid-flip from losing its fresh
        manifest. Returns the number of orphans removed."""
        import time

        cur = self.current_version()
        removed = 0
        now = time.time()
        for fn in os.listdir(self.meta_dir):
            if fn.startswith("v") and fn.endswith(".json"):
                try:
                    v = int(fn[1:-5])
                except ValueError:
                    continue
                if v > cur:
                    p = os.path.join(self.meta_dir, fn)
                    try:
                        if now - os.path.getmtime(p) < min_age_s:
                            continue
                        os.unlink(p)
                        removed += 1
                    except FileNotFoundError:
                        pass
        return removed

    # ------------------------------------------------------------- manifests

    def current_version(self) -> int:
        with open(os.path.join(self.meta_dir, "CURRENT")) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(os.path.join(self.meta_dir, f"v{v}.json")) as f:
            return json.load(f)

    def _write_manifest(self, manifest: dict) -> None:
        v = manifest["version"]
        mpath = os.path.join(self.meta_dir, f"v{v}.json")
        # O_EXCL: single winner per version → optimistic concurrency control
        fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(manifest, f)
        except Exception:
            os.unlink(mpath)
            raise
        tmp = os.path.join(self.meta_dir, f".CURRENT.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, os.path.join(self.meta_dir, "CURRENT"))

    def _try_commit(self, manifest: dict) -> None:
        try:
            self._write_manifest(manifest)
        except FileExistsError as e:
            # an orphan from a crashed writer (manifest written, CURRENT not
            # flipped) is repaired and the commit retried once; a real
            # concurrent commit will have advanced CURRENT and still conflict.
            # The age guard keeps a mid-flip concurrent writer's manifest safe.
            if self._repair_orphans(min_age_s=10.0):
                try:
                    self._write_manifest(manifest)
                    return
                except FileExistsError:
                    pass
            raise CommitConflict(
                f"version {manifest['version']} already committed"
            ) from e

    # ---------------------------------------------------------------- schema

    def schema(self, version: int | None = None) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.manifest(version)["schema"]))

    def key_cols(self) -> list[str]:
        return list(self.manifest()["key_cols"])

    def n_buckets(self) -> int:
        return int(self.manifest()["n_buckets"])

    def applied_keys(self) -> set[tuple[int, int]]:
        return {tuple(k) for k in self.manifest()["applied_keys"]}

    # ----------------------------------------------------------------- reads

    def _paths(self, manifest: dict, buckets: list[int] | None = None) -> list[str]:
        files = manifest["files"]
        keys = [str(b) for b in buckets] if buckets is not None else list(files)
        return [os.path.join(self.data_dir, rel) for k in keys for rel in files.get(k, [])]

    def read(
        self, version: int | None = None, buckets: list[int] | None = None
    ) -> DataFrame:
        """Snapshot read. Missing columns in old files surface as nulls
        (schema-evolution read path)."""
        m = self.manifest(version)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        paths = self._paths(m, buckets)
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*paths)

    # ---------------------------------------------------------------- writes

    def _write_bucket_files(
        self, df: DataFrame, commit_tag: str, n_buckets: int
    ) -> dict[str, list[str]]:
        """Write df (must carry ``_bucket``) as exactly one sorted parquet
        file per non-empty bucket under a fresh commit directory; return
        bucket -> [relpath].

        Exact placement via murmur3 preimages (:func:`_partition_preimages`):
        output partition index == bucket id, so file ``part-0000b-*`` IS
        bucket ``b`` — no dynamic-partition writer, no extra sort, no
        directory fan-out. The explicit ``repartition(n, col)`` is a
        REPARTITION_BY_NUM shuffle, which AQE never coalesces, so the write
        keeps full ``n_buckets`` parallelism at any cluster size."""
        out_rel = f"c-{commit_tag}"
        out_abs = os.path.join(self.data_dir, out_rel)
        pks = _partition_preimages(self.spark, n_buckets)
        mapping = F.create_map(
            *[F.lit(v) for b in range(n_buckets) for v in (b, pks[b])]
        )
        data_cols = [c for c in df.columns if c not in ("_bucket", "_pk")]
        (
            df.withColumn("_pk", mapping[F.col("_bucket")].cast("long"))
            .repartition(n_buckets, "_pk")
            .select(*data_cols)
            .sortWithinPartitions(*self.key_cols())
            .write.mode("overwrite")
            .parquet(out_abs)
        )
        files: dict[str, list[str]] = {}
        for fn in os.listdir(out_abs):
            if not fn.endswith(".parquet") or not fn.startswith("part-"):
                continue
            b = str(int(fn.split("-")[1]))
            files.setdefault(b, []).append(os.path.join(out_rel, fn))
        return {b: sorted(v) for b, v in files.items()}

    def overwrite(self, df: DataFrame) -> int:
        """Replace the full table contents (initial snapshot load)."""
        m = self.manifest()
        schema = evolve_schema(self.schema(), df.schema)
        df = conform_to_schema(df, schema)
        n_buckets = m["n_buckets"]
        tag = uuid.uuid4().hex[:12]
        bucketed = df.withColumn("_bucket", _bucket_expr(self.key_cols()[0], n_buckets))
        files = self._write_bucket_files(bucketed, tag, n_buckets)
        new = {
            "version": m["version"] + 1,
            "parent": m["version"],
            "schema": schema.json(),
            "key_cols": m["key_cols"],
            "n_buckets": n_buckets,
            "files": files,
            "applied_keys": m["applied_keys"],
            "props": m["props"],
            "summary": {"operation": "overwrite"},
        }
        self._try_commit(new)
        return new["version"]

    # ----------------------------------------------------------------- merge

    def merge(
        self,
        source: DataFrame,
        op_col: str | None = "op",
        policy: str = "upsert",
        commit_keys: list[tuple[int, int]] | None = None,
        assert_unique_source: bool = False,
        touched_buckets: list[int] | None = None,
    ) -> MergeStats:
        """MERGE INTO this table USING ``source`` ON the key columns.

        Policies:
        * ``upsert`` (LWW apply): matched + op='delete' → DELETE; otherwise
          UPDATE; not-matched + op≠'delete' → INSERT. (SURVEY K5/K6/A1.)
        * ``versioned_upsert``: cross-batch LWW. The table stores the winning
          event's ``op_seq``/``offset``/``op``; merge takes, per key, the max
          of (target row, source rows) by ``(op_seq, offset)`` — correct even
          when a LATE event (lower op_seq) arrives in a later batch, because
          LWW-max is associative: max(max(batch₁), max(batch₂)) = global max.
          Deletes persist as tombstones (op='delete') so an out-of-order
          pre-delete update cannot resurrect the row; filter
          ``op != 'delete'`` for final state. This is the CDC engine's apply
          arm (equivalent of Iceberg
          ``WHEN MATCHED AND s.v > t.v THEN UPDATE/DELETE``).
        * ``insert_if_absent`` (first-writer-wins): WHEN NOT MATCHED THEN
          INSERT only — existing rows never updated; the reference's
          ``insertObject`` contract (``DatabaseInformationModel.java:787-794``)
          and uid_map MERGE (``DeidentificationController.java:110-117``).

        ``source`` must contain ≤1 row per key (run lww_dedup first) — the
        same uniqueness Iceberg MERGE demands; ``assert_unique_source``
        enables a count-check (costs one extra aggregation).

        ``commit_keys`` are ``(checkpoint_epoch, partition_id)`` idempotency
        keys: keys already present in the manifest cause the whole merge to be
        skipped (a replayed epoch is a no-op); new keys are recorded in the
        same atomic manifest commit as the data.
        """
        m = self.manifest()
        key_cols = m["key_cols"]
        n_buckets = m["n_buckets"]

        # ---- idempotency gate (exactly-once replay) -----------------------
        skipped = 0
        if commit_keys is not None:
            done = {tuple(k) for k in m["applied_keys"]}
            fresh = [k for k in commit_keys if tuple(k) not in done]
            skipped = len(commit_keys) - len(fresh)
            if not fresh:
                return MergeStats(m["version"], 0, skipped, applied=False)
            commit_keys = fresh

        if assert_unique_source:
            dupes = (
                source.groupBy(*key_cols).count().filter(F.col("count") > 1).count()
            )
            if dupes:
                raise ValueError(f"merge source has {dupes} duplicate keys")

        # ---- schema evolution --------------------------------------------
        if policy == "versioned_upsert":
            # op/op_seq/offset become stored columns of the table
            src_payload_schema = source.schema
        else:
            src_payload_schema = T.StructType(
                [f for f in source.schema.fields if f.name != op_col]
            )
        schema = evolve_schema(self.schema(), src_payload_schema)

        bucket = _bucket_expr(key_cols[0], n_buckets)
        src = source.withColumn("_bucket", bucket)

        if policy == "versioned_upsert":
            # bucket discovery: callers that already aggregate over the batch
            # (lineage metrics) pass the touched set in — zero extra jobs;
            # otherwise one column-pruned scan of the raw source (conv_id
            # only — Catalyst prunes the rest), no materialization
            touched = (
                sorted(touched_buckets)
                if touched_buckets is not None
                else sorted(
                    r["_bucket"]
                    for r in source.select(bucket.alias("_bucket")).distinct().collect()
                )
            )
            target = conform_to_schema(self.read(buckets=touched), schema)
            # union + associative LWW reduce; ONE shuffle with map-side
            # combine — the source may carry duplicate keys (raw events),
            # the reduce dedups in-batch and cross-batch simultaneously
            from nifi_dicom_spark.operators.dedup import lww_dedup

            combined = target.unionByName(conform_to_schema(src, schema))
            merged = lww_dedup(combined, key_cols).withColumn("_bucket", bucket)
            merged = merged.select(*schema.fieldNames(), "_bucket")
            tag = uuid.uuid4().hex[:12]
            new_files = self._write_bucket_files(merged, tag, n_buckets)
            return self._commit_merge(
                m, schema, touched, new_files, commit_keys, policy, skipped
            )

        # cache: we reuse source for bucket discovery + anti-join + projection
        src.persist()
        try:
            touched = (
                sorted(touched_buckets)
                if touched_buckets is not None
                else sorted(
                    r["_bucket"] for r in src.select("_bucket").distinct().collect()
                )
            )
            target = conform_to_schema(self.read(buckets=touched), schema)

            if policy in ("upsert", "insert_if_absent"):
                if policy == "upsert":
                    # WHEN MATCHED → replaced: only unmatched target rows
                    # survive (NOT MATCHED BY SOURCE arm)
                    survivors = target.join(
                        src.select(*key_cols), on=key_cols, how="left_anti"
                    )
                    incoming = src
                else:  # insert_if_absent (first-writer-wins): existing rows
                    # are NEVER updated — every target row survives
                    survivors = target
                    incoming = src.join(
                        target.select(*key_cols), on=key_cols, how="left_anti"
                    )
                if op_col is not None and op_col in incoming.columns:
                    incoming = incoming.filter(F.col(op_col) != F.lit("delete"))
                incoming = conform_to_schema(incoming, schema)
                merged = (
                    survivors.unionByName(incoming)
                    .withColumn("_bucket", bucket)
                    .select(*schema.fieldNames(), "_bucket")
                )
            else:
                raise ValueError(f"unknown merge policy {policy!r}")

            tag = uuid.uuid4().hex[:12]
            new_files = self._write_bucket_files(merged, tag, n_buckets)
        finally:
            src.unpersist()

        return self._commit_merge(
            m, schema, touched, new_files, commit_keys, policy, skipped
        )

    def _commit_merge(
        self,
        m: dict,
        schema: T.StructType,
        touched: list[int],
        new_files: dict[str, list[str]],
        commit_keys: list | None,
        policy: str,
        skipped: int,
    ) -> MergeStats:
        # carry over untouched buckets; replace ONLY touched ones. The write
        # may emit files for buckets outside the touched set (Spark always
        # materializes shuffle partition 0, possibly empty) — registering
        # those would overwrite an untouched bucket's manifest entry with an
        # empty file (silent data loss); they are discarded here.
        touched_set = set(touched)
        files = dict(m["files"])
        for b in touched:
            files.pop(str(b), None)
        for b, rels in new_files.items():
            if int(b) in touched_set:
                files[b] = rels

        new = {
            "version": m["version"] + 1,
            "parent": m["version"],
            "schema": schema.json(),
            "key_cols": m["key_cols"],
            "n_buckets": m["n_buckets"],
            "files": files,
            "applied_keys": m["applied_keys"]
            + ([list(k) for k in commit_keys] if commit_keys else []),
            "props": m["props"],
            "summary": {
                "operation": "merge",
                "policy": policy,
                "touched_buckets": len(touched),
            },
        }
        self._try_commit(new)
        return MergeStats(new["version"], len(touched), skipped, applied=True)

    # ------------------------------------------------------------ maintenance

    def vacuum(self, keep_versions: int = 2) -> int:
        """Delete data files unreferenced by the newest ``keep_versions``
        manifests. Returns number of files removed."""
        cur = self.current_version()
        keep = range(max(0, cur - keep_versions + 1), cur + 1)
        referenced: set[str] = set()
        for v in keep:
            mf = self.manifest(v)
            for rels in mf["files"].values():
                referenced.update(rels)
        removed = 0
        for root, _dirs, fns in os.walk(self.data_dir):
            for fn in fns:
                abspath = os.path.join(root, fn)
                rel = os.path.relpath(abspath, self.data_dir)
                if fn.endswith(".parquet") and rel not in referenced:
                    os.unlink(abspath)
                    removed += 1
        # prune empty commit dirs
        for entry in os.listdir(self.data_dir):
            p = os.path.join(self.data_dir, entry)
            if os.path.isdir(p) and not any(
                fns for _r, _d, fns in os.walk(p)
            ):
                shutil.rmtree(p)
        return removed
