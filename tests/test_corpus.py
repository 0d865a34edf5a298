"""Corpus-building operators: shard packing (distributed prefix sum),
containment pairs (winnowing posting join), stratified sampling
(deterministic md5 filter)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from nifi_dicom_spark.functions.corpus import (
    containment_pairs,
    pack_shards,
    sample_uniform,
    stratified_sample,
)


def test_pack_shards_matches_serial_replay(spark):
    """The two-phase distributed prefix sum equals the serial cumsum, with
    boundary-straddling docs assigned to the shard where they start."""
    rows = [(i, (i * 37) % 90 + 10) for i in range(200)]  # weights 10..99
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = {
        r["id"]: r
        for r in pack_shards(
            df, "doc_id", "n_tokens", target_weight=500, n_partitions=8
        ).collect()
    }
    assert len(out) == 200
    cum = 0
    for i, wt in rows:
        start = cum
        cum += wt
        assert out[i]["weight"] == wt
        assert out[i]["cum_weight"] == cum, i
        assert out[i]["shard_id"] == start // 500, i
    # shards are contiguous in id order and at most one doc overflows each
    by_shard: dict[int, list[int]] = {}
    for i, _ in rows:
        by_shard.setdefault(out[i]["shard_id"], []).append(i)
    ids_sorted = sorted(out)
    flat = [i for s in sorted(by_shard) for i in sorted(by_shard[s])]
    assert flat == ids_sorted


def test_pack_shards_sparse_nonuniform_ids(spark):
    """Range repartitioning must not assume dense ids."""
    rows = [(10**9 + i * i, 100) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = pack_shards(df, "doc_id", "n_tokens", 250, n_partitions=8).collect()
    got = {r["id"]: r["shard_id"] for r in out}
    for rank, (i, _) in enumerate(sorted(rows)):
        assert got[i] == (rank * 100) // 250


def test_containment_pairs_embedded_doc(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    embedded = " ".join(f"tok{i}" for i in range(10, 30))  # substring of base
    unrelated = " ".join(f"zzz{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, base), (2, embedded), (3, unrelated)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r
        for r in containment_pairs(df, "text", "doc_id", min_shared=2).collect()
    }
    assert (1, 2) in got
    # winnowing guarantee: the 20-word shared run yields shared fingerprints;
    # the smaller doc is (nearly) contained
    assert got[(1, 2)]["containment"] >= 0.5
    assert not any(3 in pair for pair in got)


def test_containment_hot_fingerprint_cap(spark):
    """A fingerprint shared by more docs than max_postings generates no
    pairs (quadratic-corner guard)."""
    boiler = "same same same boilerplate words here"
    df = spark.createDataFrame(
        [(i, boiler) for i in range(10)], "doc_id long, text string"
    )
    assert (
        containment_pairs(df, "text", "doc_id", min_shared=1, max_postings=5)
        .count()
        == 0
    )
    # raise the cap → all 45 pairs appear with containment 1.0
    out = containment_pairs(
        df, "text", "doc_id", min_shared=1, max_postings=16
    ).collect()
    assert len(out) == 45
    assert all(r["containment"] == 1.0 for r in out)


def test_sample_uniform_replays_md5(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    got = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id", sample_uniform("doc_id", salt="s").alias("u")
        ).collect()
    }
    for i in range(20):
        expect = int(hashlib.md5(f"{i}s".encode()).hexdigest()[:8], 16) / 2**32
        assert abs(got[i] - expect) < 1e-12


def test_stratified_sample_deterministic_and_rate(spark):
    rows = [(i, "en" if i % 2 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept1 = stratified_sample(
        df, "doc_id", "lang", {"en": 0.5, "de": 0.1}, salt="t"
    )
    ids1 = sorted(r["doc_id"] for r in kept1.collect())
    ids2 = sorted(
        r["doc_id"]
        for r in stratified_sample(
            df, "doc_id", "lang", {"en": 0.5, "de": 0.1}, salt="t"
        ).collect()
    )
    assert ids1 == ids2  # bit-identical across runs
    en = sum(1 for i in ids1 if i % 2)
    de = sum(1 for i in ids1 if not i % 2)
    assert abs(en / 1000 - 0.5) < 0.06
    assert abs(de / 1000 - 0.1) < 0.04
    # python replay agrees row-for-row
    expect = [
        i
        for i, lang in rows
        if int(hashlib.md5(f"{i}t".encode()).hexdigest()[:8], 16) / 2**32
        < (0.5 if lang == "en" else 0.1)
    ]
    assert ids1 == sorted(expect)
    # unknown group uses default_rate (0.0 → dropped entirely)
    other = spark.createDataFrame([(1, "xx")], "doc_id long, lang string")
    assert stratified_sample(other, "doc_id", "lang", {"en": 1.0}).count() == 0


def test_pack_shards_plan_has_no_global_window(spark):
    """The scale contract: no single-partition Exchange (global window)
    anywhere in the plan — partitioning comes from range repartition."""
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit(10).alias("n_tokens")
    )
    out = pack_shards(df, "doc_id", "n_tokens", 100, n_partitions=8)
    # localCheckpoint already materialized it; re-derive the logical plan
    # from a fresh call without the checkpoint for plan inspection
    from nifi_dicom_spark.functions import corpus as C

    base = (
        df.select(F.col("doc_id").alias("id"), F.col("n_tokens").cast("long").alias("weight"))
        .repartitionByRange(8, "id")
        .sortWithinPartitions("id")
        .withColumn("_pid", F.spark_partition_id())
    )
    plan = base._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert out.count() == 1000


# --- decontamination ---------------------------------------------------------


def test_decontaminate_planted_and_plan(spark):
    from nifi_dicom_spark.functions.corpus import decontaminate

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    heldout = spark.createDataFrame(
        [(100, base), (101, "totally different benchmark prompt here")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            (1, base),  # exact copy of heldout 100 → hamming 0
            # same token SET, different order/multiplicity — simhash is a
            # bag-of-distinct-tokens measure, so this is hamming 0 too
            (2, "kappa iota theta eta zeta epsilon delta gamma beta alpha alpha"),
            (3, "unrelated text about spark shuffles and parquet readers"),
        ],
        ["doc_id", "text"],
    )
    out = decontaminate(train, heldout, "text", "doc_id")
    rows = {r["id"]: r for r in out.collect()}
    assert 1 in rows and rows[1]["matched_heldout_id"] == 100
    assert rows[1]["min_hamming"] == 0 and rows[1]["n_matches"] == 1
    assert 2 in rows, "near-copy should collide on a chunk and verify"
    assert 3 not in rows
    # plan shape: heldout chunks broadcast — the train side must not be
    # exchanged for the candidate join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_decontaminate_rejects_bad_pigeonhole(spark):
    import pytest as _pytest

    from nifi_dicom_spark.functions.corpus import decontaminate

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="pigeonhole"):
        decontaminate(df, df, "text", "doc_id", max_hamming=4, n_bands=4)
