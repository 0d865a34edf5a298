"""Incremental near-dup dedup against a durable signature store.

The batch dedup family (``functions/dedup_text``) answers "which docs in
THIS corpus duplicate each other"; a CDC/ingest pipeline needs the
incremental question: "is this arriving document a near-dup of anything
EVER ingested?" — without rescanning the corpus per batch. This operator
marries the two engine halves:

* the SimHash pigeonhole banding from :func:`..functions.dedup_text
  .simhash_near_dup` (hamming < n_bands ⇒ a shared band chunk), and
* the lake table's bucket-pruned, first-writer-wins merge — the exact
  keymap pattern (``operators/keymap.py``, reference
  ``DeidentificationController.java:110-117`` MERGE-if-absent).

The store holds one row per (band:chunk, doc id) with the doc's full
signature, bucketed by the band:chunk composite. Per batch:

1. signature + banded chunks of the incoming docs (narrow, Arrow kernel);
2. bucket-pruned read of ONLY the store buckets the batch's chunks hash
   into (O(batch) buckets touched, never O(corpus)); the batch's own ids
   are anti-joined out of the store view FIRST — on a crash-replay of a
   batch whose inserts already committed this restores the exact store
   state the first run probed (same hot-bucket counts, same matches ⇒
   identical decisions on replay); the batch side of the probe join is
   broadcast;
3. hamming-verified matches → dup (matched_id = min matching stored id);
4. survivors are near-dup-clustered WITHIN the batch (connected
   components; small graphs take the driver union-find path) — cluster
   roots (min id) are unique, members point at their root; the self-join
   is gated by the same ``max_bucket_size`` cap as the store probe, so a
   boilerplate flood degrades to "every doc unique" instead of a
   quadratic pair explosion;
5. roots' signature rows are inserted with ``insert_if_absent``
   (re-inserts are no-ops — cardinality never grows on replay).

Scale: per-batch cost ∝ batch size + the pruned store buckets; the store
only ever receives rows for UNIQUE docs, so boilerplate floods don't grow
it. Degenerate chunks (identical boilerplate signatures) are capped on the
store side by ``max_bucket_size`` at probe time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_dicom_spark.lake.snapshot_table import SnapshotTable

SIGNATURE_SCHEMA = T.StructType(
    [
        T.StructField("bc", T.StringType(), False),  # "band:chunk" composite
        T.StructField("id", T.StringType(), False),
        T.StructField("simhash", T.LongType(), False),
    ]
)


def create_signature_store(
    spark: SparkSession, path: str, n_buckets: int = 16
) -> SnapshotTable:
    """Durable signature store, bucketed by the band:chunk composite so
    probe reads prune to the batch's chunks."""
    return SnapshotTable.create(
        spark, path, SIGNATURE_SCHEMA, key_cols=["bc", "id"], n_buckets=n_buckets
    )


def _chunk_array(n_bits: int, n_bands: int) -> F.Column:
    """``array<string>`` of ``"band:chunk"`` store keys — the string form of
    the ONE shared band layout (:func:`..functions.dedup_text
    .simhash_band_chunks`), so store rows written here are probe-compatible
    with every other simhash-banded operator."""
    from nifi_dicom_spark.functions.dedup_text import simhash_band_chunks

    return F.transform(
        simhash_band_chunks(n_bits, n_bands),
        lambda s: F.concat(
            s["band"].cast("string"), F.lit(":"), s["chunk"].cast("string")
        ),
    )


def incremental_dedup(
    store: SnapshotTable,
    docs: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_bits: int = 60,
    n_bands: int = 4,
    max_bucket_size: int = 256,
    commit_keys: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Process one batch; returns (id, is_unique, matched_id) — matched_id
    is the stored/root doc this one duplicates (null when unique). Unique
    docs' signatures are committed to the store before returning.

    ``commit_keys`` flow through to the store merge for exactly-once epoch
    bookkeeping (a replayed epoch skips the insert; the returned decisions
    are identical either way — see module docstring step 3).
    """
    from nifi_dicom_spark.functions.dedup_text import hamming64, simhash_signatures
    from nifi_dicom_spark.operators.merge_context import connected_groups

    if max_hamming >= n_bands:
        raise ValueError(
            f"pigeonhole needs max_hamming < n_bands "
            f"(got {max_hamming} >= {n_bands}); raise n_bands"
        )
    # one row per doc (the expensive Arrow kernel) — persisted; the banded
    # explode is re-derived from it on demand (trivial over cached rows)
    batch_ids = (
        simhash_signatures(docs, text_col, id_col, n_bits)
        .select(F.col("id").cast("string").alias("id"), "simhash")
        .persist()
    )
    batch = batch_ids.select(
        "id", "simhash", F.explode(_chunk_array(n_bits, n_bands)).alias("bc")
    )
    dup_vs_store = None
    try:
        # bucket-pruned store probe: only the buckets the batch's chunks
        # hash into are read (bounded collect — O(batch chunks), and at
        # most n_buckets values)
        touched = sorted(
            r["b"]
            for r in batch.select(store.bucket_expr("bc").alias("b"))
            .distinct()
            .collect()
        )
        stored = store.read(buckets=touched)
        # Exclude the batch's OWN ids from the store view BEFORE anything —
        # including the hot-bucket count. On a crash-replay the store already
        # contains this batch's committed roots; if they were counted, a
        # bucket could cross max_bucket_size only on the replay and drop a
        # match the first run found (decisions must be identical on replay,
        # and a flipped decision also re-inserts the doc — cardinality
        # growth). With self rows removed the probe sees the store exactly
        # as the first run did.
        stored = stored.join(
            F.broadcast(batch_ids.select("id")), "id", "left_anti"
        )
        # probe join: batch chunks (small) broadcast against pruned store;
        # degenerate store chunks capped before pairing
        hot = (
            stored.groupBy("bc")
            .count()
            .filter(F.col("count") > max_bucket_size)
            .select("bc")
        )
        stored = stored.join(F.broadcast(hot), "bc", "left_anti")
        matches = (
            stored.select(
                F.col("bc"),
                F.col("id").alias("_st_id"),
                F.col("simhash").alias("_st_sig"),
            )
            .join(
                F.broadcast(
                    batch.select(
                        F.col("id").alias("_new_id"),
                        F.col("simhash").alias("_new_sig"),
                        "bc",
                    )
                ),
                "bc",
            )
            .filter(hamming64(F.col("_st_sig"), F.col("_new_sig")) <= max_hamming)
            .groupBy(F.col("_new_id").alias("id"))
            .agg(F.min("_st_id").alias("matched_id"))
        )
        dup_vs_store = matches.persist()
        survivors = batch_ids.join(dup_vs_store, "id", "left_anti")

        # within-batch clustering of the survivors: same pigeonhole
        # self-join, and the SAME degenerate-bucket cap as the store probe —
        # without it a boilerplate flood (one shared chunk across B docs)
        # materializes B²/2 pairs through the distinct. The trade is the
        # one simhash_near_dup documents: capped chunks lose those pairs
        # (the flood's docs insert as individual uniques) instead of
        # running quadratic work; bound store growth with a coarser
        # upstream exact-dedup if boilerplate floods are expected.
        surv_banded = batch.join(survivors.select("id"), "id", "left_semi")
        eligible = (
            surv_banded.groupBy("bc")
            .count()
            .filter(
                (F.col("count") >= 2) & (F.col("count") <= max_bucket_size)
            )
            .select("bc")
        )
        surv_banded = surv_banded.join(
            F.broadcast(eligible), "bc", "left_semi"
        )
        l, r = surv_banded.alias("l"), surv_banded.alias("r")
        in_batch_pairs = (
            l.join(
                r,
                on=[
                    F.col("l.bc") == F.col("r.bc"),
                    F.col("l.id") < F.col("r.id"),
                ],
            )
            .filter(
                hamming64(F.col("l.simhash"), F.col("r.simhash")) <= max_hamming
            )
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        comp = connected_groups(in_batch_pairs, "id_a", "id_b")
        in_batch_dup = (
            comp.filter(F.col("node") != F.col("component"))
            .select(
                F.col("node").alias("id"), F.col("component").alias("matched_id")
            )
        )
        decisions = (
            batch_ids.select("id")
            .join(
                dup_vs_store.unionByName(in_batch_dup).withColumnRenamed(
                    "matched_id", "_m"
                ),
                "id",
                "left",
            )
            .select(
                "id",
                F.col("_m").isNull().alias("is_unique"),
                F.col("_m").alias("matched_id"),
            )
            .localCheckpoint(eager=True)
        )

        # commit the unique docs' signature rows (first-writer-wins).
        # touched_buckets = the buckets the INSERTS land in, not the probe
        # set: a dup-heavy batch probes many buckets but writes few (or
        # none), and the store merge is copy-on-write per touched bucket —
        # passing the probe superset would rewrite O(store) per epoch.
        uniques = decisions.filter("is_unique").select("id")
        new_rows = batch.join(uniques, "id", "left_semi").select(
            "bc", "id", "simhash"
        )
        write_touched = sorted(
            r["b"]
            for r in new_rows.select(store.bucket_expr("bc").alias("b"))
            .distinct()
            .collect()
        )
        store.merge(
            new_rows,
            op_col=None,
            policy="insert_if_absent",
            commit_keys=commit_keys,
            touched_buckets=write_touched,
        )
        return decisions
    finally:
        batch_ids.unpersist()
        if dup_vs_store is not None:
            dup_vs_store.unpersist()
