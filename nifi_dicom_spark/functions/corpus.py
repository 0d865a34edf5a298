"""Corpus-building operators for training-data pipelines: token-budget
shard packing, substring-containment detection, deterministic stratified
sampling.

These are the steps between "deduplicated documents" and "training
shards": pack documents into fixed-token-budget shards in a stable global
order (distributed prefix sum — no single-partition window), find
near-containment pairs (one doc embedded in another) via shared winnowing
fingerprints (posting-list join with a hot-fingerprint cap — no all-pairs),
and draw per-group deterministic samples (pure md5 expression — zero
shuffle, bit-replayable for oracle checks and idempotent re-runs).

Scale shapes at 10^9 docs:
* ``pack_shards``: range-repartition on the order key → per-partition
  window cumsum + O(partitions) driver-side offset prefix — the classic
  two-phase distributed scan; never a global single-partition window.
* ``containment_pairs``: explode fingerprint postings → shuffle on the
  fingerprint → self-join within posting lists, capped — same shape as
  the MinHash bucket join in :mod:`.dedup_text`.
* ``stratified_sample``: narrow map, whole-stage codegen, no Python.

Reference analog: the reference routes studies into fixed-size batches per
destination (`nifi` flowfile batching) and samples via deterministic
hashing for idempotency (``IdentityEntry.java:28-41`` md5 determinism);
both patterns re-expressed here over document corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_shards(
    df: DataFrame,
    id_col: str,
    weight_col: str | Column,
    target_weight: int,
    n_partitions: int | None = None,
) -> DataFrame:
    """Assign each row to a training shard of ≤ ``target_weight`` total
    weight (token count), packing in ascending ``id_col`` order:
    ``shard_id = (running_total_before_row) // target_weight``. A row that
    straddles a boundary belongs to the shard where it starts (standard
    contiguous packing; shards may overflow by < one document).

    Distributed prefix sum, NOT a global window: range-repartition on the
    id so partitions hold contiguous id ranges, cumsum within each
    partition (a per-partition window), then add each partition's
    exclusive prefix offset — computed driver-side from the O(partitions)
    per-partition totals. Wall-clock is one shuffle + one tiny collect at
    any data size; a naive ``Window.orderBy(id)`` with no partitionBy
    funnels the whole table through ONE task and is exactly the
    scale-killer this avoids.

    Returns (id, weight, cum_weight, shard_id) where ``cum_weight`` is the
    inclusive running total in id order.
    """
    spark = df.sparkSession
    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    base = (
        df.select(F.col(id_col).alias("id"), wcol.cast("long").alias("weight"))
        .repartitionByRange(n_parts, "id")
        .sortWithinPartitions("id")
        .withColumn("_pid", F.spark_partition_id())
        # branch point: the totals aggregate and the window scan must see
        # the SAME partitioning (spark_partition_id is plan-dependent) —
        # persist pins it
        .persist()
    )
    try:
        totals = {
            r["_pid"]: r["t"]
            for r in base.groupBy("_pid").agg(F.sum("weight").alias("t")).collect()
        }  # O(partitions) driver-side — never O(rows)
        running, offsets = 0, []
        for pid in sorted(totals):
            offsets.append((pid, running))
            running += totals[pid]
        off_df = spark.createDataFrame(offsets, "_pid int, _off long")
        w = (
            Window.partitionBy("_pid")
            .orderBy("id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = (
            base.join(F.broadcast(off_df), "_pid")
            .withColumn("cum_weight", F.sum("weight").over(w) + F.col("_off"))
            .withColumn(
                "shard_id",
                F.floor(
                    (F.col("cum_weight") - F.col("weight")) / F.lit(target_weight)
                ),
            )
            .select("id", "weight", "cum_weight", "shard_id")
        )
        # eager: release the pinned partitioning before returning
        return out.localCheckpoint(eager=True)
    finally:
        base.unpersist()


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_postings: int = 64,
) -> DataFrame:
    """Substring-containment candidates: pairs of documents sharing
    ≥ ``min_shared`` winnowing fingerprints, scored by containment =
    shared / min(|fp_a|, |fp_b|) — near 1.0 when one document's content is
    embedded in the other (quotation, boilerplate wrapping, near-superset
    duplicates), the case Jaccard-style near-dup misses because the union
    is dominated by the larger doc.

    Winnowing's guarantee (Schleimer et al.) makes this sound: any shared
    run of ≥ w+k-1 words yields at least one shared fingerprint, so long
    embedded substrings are caught with fingerprint sets ~|doc|/w.

    Scale shape: explode fingerprints to a posting list → shuffle on the
    fingerprint → pairs generated per posting, with fingerprints appearing
    in > ``max_postings`` docs dropped (boilerplate guard — a fingerprint
    shared by B docs yields B²/2 pairs; same quadratic-corner cap as the
    MinHash bucket join). No all-pairs comparison anywhere.
    """
    from nifi_dicom_spark.functions.dedup_text import winnow_fingerprints

    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    fps = (
        df.select(
            F.col(id_col).alias("id"),
            winnow_fingerprints(text_col, k=k, w=w).alias("_fp"),
        )
        .repartition(n_parts, "id")
        .persist()
    )
    try:
        sizes = fps.select("id", F.size("_fp").alias("n_fp"))
        posting = fps.select("id", F.explode("_fp").alias("fp"))
        eligible = (
            posting.groupBy("fp")
            .count()
            .filter((F.col("count") >= 2) & (F.col("count") <= max_postings))
            .select("fp")
        )
        gated = posting.join(eligible, "fp", "left_semi")
        pairs = (
            gated.alias("l")
            .join(
                gated.alias("r"),
                on=[
                    F.col("l.fp") == F.col("r.fp"),
                    F.col("l.id") < F.col("r.id"),
                ],
            )
            .groupBy(
                F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b")
            )
            .agg(F.count(F.lit(1)).alias("shared_fp"))
            .filter(F.col("shared_fp") >= min_shared)
        )
        out = (
            pairs.join(
                sizes.select(
                    F.col("id").alias("id_a"), F.col("n_fp").alias("_na")
                ),
                "id_a",
            )
            .join(
                sizes.select(
                    F.col("id").alias("id_b"), F.col("n_fp").alias("_nb")
                ),
                "id_b",
            )
            .withColumn(
                "containment",
                F.round(
                    F.col("shared_fp") / F.least(F.col("_na"), F.col("_nb")), 6
                ),
            )
            .select("id_a", "id_b", "shared_fp", "containment")
        )
        return out.localCheckpoint(eager=True)
    finally:
        fps.unpersist()


def sample_uniform(id_col: str | Column, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1): md5 of the id (+ salt) → first 8
    hex chars → 32-bit int / 2^32. Pure expression (JVM codegen), identical
    on every run and replayable in any SQL engine:
    ``('0x' || substr(md5(id || salt), 1, 8))::BIGINT / 4294967296.0``.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(
        F.substring(F.md5(F.concat(c.cast("string"), F.lit(salt))), 1, 8), 16, 10
    ).cast("bigint")
    return h / F.lit(float(1 << 32))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-group deterministic sampling: keep a row iff its md5-uniform
    (:func:`sample_uniform`) falls below the group's rate. The rate map is
    inlined as a literal CASE chain (it is human-sized config, like the
    deidentify rule set — no join, no broadcast, full codegen), so the
    whole operator is a narrow filter: zero shuffle, zero Python, and the
    SAME rows are kept on every run and every engine — re-running a 100-TB
    sampling job appends nothing new, and upstream/downstream replays
    agree (same md5-determinism contract as the reference's
    pseudo-identities, ``IdentityEntry.java:28-41``).
    """
    u = sample_uniform(id_col, salt)
    rate: Column = F.lit(float(default_rate))
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    # _u is the RAW uniform (hash/2^32 — exactly representable in float64,
    # so bit-identical across engines): re-applying `_u < rate` to the
    # output reproduces the kept-set exactly. A rounded _u would contradict
    # the filter on boundary rows.
    return df.withColumn("_u", u).filter(F.col("_u") < rate)


def decontaminate(
    train: DataFrame,
    heldout: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_bits: int = 60,
    n_bands: int = 4,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Benchmark decontamination: which training documents near-duplicate a
    heldout/eval document (SimHash hamming ≤ ``max_hamming``)?

    Returns one row per CONTAMINATED train doc: (id, matched_heldout_id =
    min matching heldout id, min_hamming, n_matches = distinct heldout docs
    matched). Anti-join the result against the corpus to drop them.

    Scale shape: the heldout set is a benchmark — thousands of docs against
    10^9+ train docs — so its banded signature chunks are **broadcast**;
    the train side is a single narrow scan + explode with NO shuffle (the
    only aggregation is over the few contaminated survivors). The pigeonhole
    banding is the same contract as :func:`..dedup_text.simhash_near_dup`:
    hamming < n_bands ⇒ at least one shared chunk. ``max_bucket_size`` caps
    degenerate heldout chunks (boilerplate prompts) the same way the
    self-join variant does.

    Complement: pair with :func:`containment_pairs` to also catch verbatim
    benchmark text embedded inside a larger train doc (simhash is a
    whole-document measure; containment is the substring one).
    """
    from .dedup_text import hamming64, simhash_band_chunks, simhash_signatures

    if max_hamming >= n_bands:
        raise ValueError(
            f"pigeonhole needs max_hamming < n_bands "
            f"(got {max_hamming} >= {n_bands}); raise n_bands"
        )

    def _chunks(df: DataFrame) -> DataFrame:
        sigs = simhash_signatures(df, text_col, id_col, n_bits)
        arr = simhash_band_chunks(n_bits, n_bands)
        return sigs.select("id", "simhash", F.explode(arr).alias("bb")).select(
            "id", "simhash", "bb.band", "bb.chunk"
        )

    ho = _chunks(heldout)
    # cap degenerate heldout chunks, then broadcast: the train side never
    # shuffles — candidate generation rides the scan
    hot = (
        ho.groupBy("band", "chunk")
        .count()
        .filter(F.col("count") > max_bucket_size)
        .select("band", "chunk")
    )
    ho = ho.join(F.broadcast(hot), ["band", "chunk"], "left_anti").select(
        F.col("id").alias("_ho_id"),
        F.col("simhash").alias("_ho_sig"),
        "band",
        "chunk",
    )
    tr = _chunks(train)
    cand = tr.join(F.broadcast(ho), ["band", "chunk"]).select(
        "id",
        F.col("_ho_id").alias("heldout_id"),
        hamming64(F.col("simhash"), F.col("_ho_sig")).alias("hamming"),
    )
    pairs = cand.filter(F.col("hamming") <= max_hamming).distinct()
    return pairs.groupBy("id").agg(
        F.min("heldout_id").alias("matched_heldout_id"),
        F.min("hamming").alias("min_hamming"),
        F.count(F.lit(1)).alias("n_matches"),
    )


# --------------------------------------------------------------- chunking


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Training-window construction: split each document into overlapping
    token windows of ``max_tokens`` with ``overlap`` tokens carried between
    consecutive windows (stride = ``max_tokens − overlap``) — the step
    between "clean documents" and "training sequences".

    Output: one row per chunk — ``(id, chunk_idx, start_token,
    n_chunk_tokens, chunk_text)``. A document with ≤ ``max_tokens`` tokens
    yields exactly one chunk; an empty document yields none; the last
    chunk is the (possibly short) remainder. Chunk boundaries are pure
    whitespace-token arithmetic (the same tokenizer as
    :mod:`nifi_dicom_spark.functions.text`), so the operator is a single
    zero-shuffle projection + explode: built-in `sequence`/`slice`/
    `concat_ws` only, whole-stage codegen, no Python — at 100 TB the cost
    is one pass over the text column with output ∝ total tokens.
    """
    from nifi_dicom_spark.functions.text import tokens as _tokens

    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"need 0 <= overlap < max_tokens, got {overlap}/{max_tokens}"
        )
    stride = max_tokens - overlap
    toks = _tokens(text_col)  # the engine's ONE whitespace tokenizer
    n = F.size(F.col("_toks"))
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= max_tokens, F.lit(1))
        .otherwise(F.ceil((n - F.lit(max_tokens)) / F.lit(float(stride))) + 1)
        .cast("int")
    )
    idx = F.col("_chunk_idx")
    sliced = F.slice(F.col("_toks"), idx * stride + 1, max_tokens)
    return (
        df.select(F.col(id_col).alias("id"), toks.alias("_toks"))
        .withColumn(
            "_chunk_idx",
            F.explode(
                # sequence(0, -1) would count DOWN; empty docs must emit an
                # empty array so the explode drops them instead
                F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
                    F.array().cast("array<int>")
                )
            ),
        )
        .select(
            "id",
            idx.cast("int").alias("chunk_idx"),
            (idx * stride).cast("int").alias("start_token"),
            F.size(sliced).cast("int").alias("n_chunk_tokens"),
            F.concat_ws(" ", sliced).alias("chunk_text"),
        )
    )


# --------------------------------------------------------- corpus mixture


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-mixture arithmetic: given target mixture ``weights`` per
    source and a total ``token_budget``, compute per-source availability
    and the deterministic sampling rate that hits the target — the plan a
    training-data pipeline derives before materializing a weighted corpus.

    ``sample_rate`` > 1 means upsampling (the source must repeat across
    epochs to meet its weight); :func:`mixture_sample` applies either
    direction deterministically. One tiny aggregate over the corpus
    (partial-agg map-side; the result is sources-sized), so the plan costs
    a single column scan at any corpus size. Sources absent from
    ``weights`` get weight 0 (dropped by the sample step).

    Weighted sources ABSENT from the corpus (e.g. a typo'd source name)
    still get a plan row — ``n_docs=0, available_tokens=0`` — so a
    misconfigured mixture surfaces in the plan instead of silently
    shrinking the budget. ``sample_rate`` for an unsatisfiable source
    (positive target, zero available tokens) is NULL, never a division
    crash or a silently-dropped row.
    """
    from nifi_dicom_spark.functions.text import token_count

    total_w = sum(weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum > 0")
    ntok = token_count(text_col)  # the engine's ONE whitespace tokenizer
    avail = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ntok).cast("long").alias("available_tokens"),
    )
    # full outer vs the weight keys: weighted-but-absent sources become
    # explicit zero-availability rows (the literal side is sources-sized,
    # broadcast — no extra scan of the corpus)
    spark = df.sparkSession
    wanted = spark.createDataFrame(
        [(s,) for s in sorted(weights)], "source string"
    )
    avail = (
        avail.join(F.broadcast(wanted), on="source", how="full_outer")
        .select(
            "source",
            F.coalesce(F.col("n_docs"), F.lit(0)).alias("n_docs"),
            F.coalesce(F.col("available_tokens"), F.lit(0))
            .cast("long")
            .alias("available_tokens"),
        )
    )
    w: Column = F.lit(0.0)
    for s, v in sorted(weights.items()):
        w = F.when(F.col("source") == s, F.lit(float(v) / total_w)).otherwise(w)
    target = w * F.lit(float(token_budget))
    return avail.select(
        "source",
        "n_docs",
        "available_tokens",
        F.round(w, 6).alias("weight"),
        F.round(target).cast("long").alias("target_tokens"),
        F.when(
            F.col("available_tokens") > 0,
            F.round(target / F.col("available_tokens"), 6),
        )
        .when(target == 0, F.lit(0.0))
        .alias("sample_rate"),  # NULL = unsatisfiable (target > 0, nothing available)
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "",
) -> DataFrame:
    """Apply a mixture plan's per-source rates deterministically, BOTH
    directions: rate ≤ 1 downsamples (md5-uniform keep, exactly
    :func:`stratified_sample`'s contract), rate > 1 upsamples — every doc
    repeats ``floor(rate)`` times plus one more iff its uniform falls
    below the fractional part, so expected copies = rate with zero
    variance re-run to re-run (the kept multiset is a pure function of
    ids). Output adds ``_copy`` (1-based repeat index: distinct training
    epochs of the same doc stay distinguishable downstream) and ``_u``
    (the raw uniform, for replay audits). Zero shuffle — a filter +
    bounded explode, whole-stage codegen.
    """
    u = sample_uniform(id_col, salt)
    rate: Column = F.lit(0.0)
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == s, F.lit(float(r))).otherwise(rate)
    n_copies = (
        F.floor(rate) + F.when(F.col("_u") < rate - F.floor(rate), 1).otherwise(0)
    ).cast("int")
    return (
        df.withColumn("_u", u)
        .withColumn("_n_copies", n_copies)
        .withColumn(
            "_copy",
            F.explode(
                F.when(
                    F.col("_n_copies") > 0,
                    F.sequence(F.lit(1), F.col("_n_copies")),
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .drop("_n_copies")
    )


def corpus_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle: assign every document a stable
    pseudo-random position (1-based, dense, no gaps) by ordering on
    ``md5(id ‖ ':' ‖ salt)``. Training pipelines need the corpus in a
    reproducible random order (shard writers consume positions 1..N);
    ``ORDER BY rand()`` is neither reproducible nor restart-safe, while a
    keyed hash order is a pure function of (ids, salt) — identical across
    re-runs, partial re-runs, and engines (the DuckDB oracle recomputes
    it exactly).

    Same two-phase distributed scan as :func:`pack_shards`: range-
    repartition on the hash key so partitions hold contiguous key ranges,
    per-partition row_number, then add each partition's exclusive prefix
    count — the O(partitions) driver-side fold. Never a global
    single-partition window; one shuffle at any corpus size. Ties (md5
    collisions) break on the id itself, keeping the order total.

    Returns ``(id, shuffle_key, position)``.
    """
    spark = df.sparkSession
    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    base = (
        df.select(F.col(id_col).alias("id"), key.alias("shuffle_key"))
        .repartitionByRange(n_parts, "shuffle_key", "id")
        .sortWithinPartitions("shuffle_key", "id")
        .withColumn("_pid", F.spark_partition_id())
        # same branch point as pack_shards: the counts aggregate and the
        # window scan must observe ONE partitioning — persist pins it
        .persist()
    )
    try:
        counts = {
            r["_pid"]: r["c"]
            for r in base.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
        }  # O(partitions), never O(rows)
        running, offsets = 0, []
        for pid in sorted(counts):
            offsets.append((pid, running))
            running += counts[pid]
        off_df = spark.createDataFrame(offsets, "_pid int, _off long")
        w = Window.partitionBy("_pid").orderBy("shuffle_key", "id")
        out = (
            base.join(F.broadcast(off_df), "_pid")
            .withColumn("position", F.row_number().over(w) + F.col("_off"))
            .select("id", "shuffle_key", "position")
        )
        # eager: release the pinned partitioning before returning
        return out.localCheckpoint(eager=True)
    finally:
        base.unpersist()
