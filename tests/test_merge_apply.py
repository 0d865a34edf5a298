"""M1 keystone: batch replay of a change log → final-state equality vs the
pure-pandas oracle (reference test style: round-trip oracle,
``DeidentifyEncryptDICOMTest.java:97-123``; state-count assertions,
``DeidentifyDICOMTest.java:81-103``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from nifi_dicom_spark.fixtures.generator import GeneratorConfig, generate_change_events
from nifi_dicom_spark.fixtures.oracle import (
    assert_final_state_equal,
    replay_oracle,
    split_malformed,
)
from nifi_dicom_spark.model import CHANGE_EVENTS_SCHEMA
from nifi_dicom_spark.operators.apply import (
    apply_changes,
    create_transcripts_table,
    read_final_state,
)


def _spark_events(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(pdf, schema=CHANGE_EVENTS_SCHEMA)


@pytest.fixture(scope="module")
def small_log():
    cfg = GeneratorConfig(
        seed=7,
        n_conversations=30,
        max_turns=8,
        n_events=2_000,
        duplicate_ratio=0.08,
        late_ratio=0.15,
        malformed_ratio=0.03,
    )
    return generate_change_events(cfg)


def test_generator_deterministic():
    cfg = GeneratorConfig(seed=11, n_events=500)
    a = generate_change_events(cfg)
    b = generate_change_events(cfg)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["schema_ver"].unique()) <= {1, 2}
    assert (a["op"].isin(["insert", "update", "delete"])).all()


def test_oracle_basics():
    ev = pd.DataFrame(
        {
            "offset": [0, 1, 2, 3, 4],
            "partition_id": [0] * 5,
            "op": ["insert", "update", "delete", "insert", "update"],
            "op_seq": [1, 2, 3, 1, 1],  # last row duplicates op_seq=1 of key B
            "conv_id": ["A", "A", "A", "B", "B"],
            "turn_idx": [0, 0, 0, 0, 0],
            "role": ["user", "user", None, "user", "assistant"],
            "text": ["t1", "t2", None, "b1", "b2"],
            "tool": [None] * 5,
            "ts": pd.to_datetime(["2024-01-01"] * 5),
            "schema_ver": [2] * 5,
        }
    )
    final = replay_oracle(ev)
    # key A deleted; key B: duplicate op_seq=1 → offset 4 wins (b2)
    assert final["conv_id"].tolist() == ["B"]
    assert final["text"].tolist() == ["b2"]


def test_batch_replay_matches_oracle(spark, small_log, tmp_path):
    table = create_transcripts_table(spark, str(tmp_path / "transcripts"))
    res = apply_changes(table, _spark_events(spark, small_log), epoch=0)
    assert res.merge.applied

    actual = read_final_state(table).toPandas()
    expected = replay_oracle(small_log)
    assert_final_state_equal(actual, expected)

    # lineage metrics account for every event exactly once
    mt = pd.DataFrame(res.metrics)
    assert mt["n_events"].sum() == len(small_log)
    _, bad = split_malformed(small_log)
    assert mt["n_quarantined"].sum() == len(bad)
    assert mt["high_watermark_offset"].max() == small_log["offset"].max()


def test_multi_batch_replay_with_late_events(spark, small_log, tmp_path):
    """Cross-batch LWW: split the log by delivery order into 4 epochs (late
    events land in later epochs with *lower* op_seq) — final state must still
    equal the global oracle."""
    table = create_transcripts_table(spark, str(tmp_path / "transcripts"))
    chunks = np.array_split(np.arange(len(small_log)), 4)
    for epoch, idx in enumerate(chunks):
        apply_changes(table, _spark_events(spark, small_log.iloc[idx]), epoch=epoch)

    actual = read_final_state(table).toPandas()
    assert_final_state_equal(actual, replay_oracle(small_log))


def test_reapply_epoch_is_noop(spark, small_log, tmp_path):
    """Exactly-once: re-merging an already-committed epoch is detected and
    skipped (reference analog: idempotent uid_map MERGE,
    ``DeidentificationController.java:108-123``)."""
    table = create_transcripts_table(spark, str(tmp_path / "transcripts"))
    ev = _spark_events(spark, small_log)
    r1 = apply_changes(table, ev, epoch=0)
    v1 = table.current_version()
    r2 = apply_changes(table, ev, epoch=0)  # crash-replay of the same epoch
    assert r1.merge.applied and not r2.merge.applied
    assert table.current_version() == v1
    assert_final_state_equal(
        read_final_state(table).toPandas(), replay_oracle(small_log)
    )


def test_duplicate_op_seq_conflict_policy(spark, tmp_path):
    """Conflict policy: duplicate op_seq resolved by offset (total order)."""
    pdf = pd.DataFrame(
        {
            "offset": [10, 11],
            "partition_id": [0, 1],
            "op": ["insert", "update"],
            "op_seq": [5, 5],
            "conv_id": ["X", "X"],
            "turn_idx": [1, 1],
            "role": ["user", "user"],
            "text": ["first", "second"],
            "tool": [None, None],
            "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
            "schema_ver": [2, 2],
        }
    )
    table = create_transcripts_table(spark, str(tmp_path / "t"))
    apply_changes(table, _spark_events(spark, pdf), epoch=0)
    out = read_final_state(table).toPandas()
    assert out["text"].tolist() == ["second"]


def test_one_file_per_bucket_layout(spark, small_log, tmp_path):
    """Physical layout invariant: each committed data file holds exactly the
    rows of its manifest bucket (file part-index == bucket id), so bucket
    pruning at read/merge time is exact."""
    import os

    from pyspark.sql import functions as F

    from nifi_dicom_spark.lake.snapshot_table import SnapshotTable, _bucket_expr

    table = create_transcripts_table(spark, str(tmp_path / "transcripts"))
    apply_changes(table, _spark_events(spark, small_log), epoch=0)

    m = table.manifest()
    n_buckets = m["n_buckets"]
    for b_str, rels in m["files"].items():
        for rel in rels:
            df = spark.read.parquet(os.path.join(table.data_dir, rel))
            got = df.select(
                _bucket_expr("conv_id", n_buckets).alias("b")
            ).distinct().collect()
            assert {r["b"] for r in got} <= {int(b_str)}, (
                f"file {rel} contains rows outside bucket {b_str}"
            )
    # bucket-pruned read returns exactly the rows of those buckets
    some = [int(b) for b in list(m["files"])[:3]]
    pruned = table.read(buckets=some)
    full = table.read().withColumn("_b", _bucket_expr("conv_id", n_buckets))
    expect = full.filter(F.col("_b").isin(some)).drop("_b")
    assert pruned.count() == expect.count()
