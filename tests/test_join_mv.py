"""Continuous JOIN materialization (streaming/join_mv.py): backfill,
live maintenance from both feeds, fan-out dimension updates, inner-join
row loss vs left-join null-fill, restart resume, and spec validation.

Convergence contract under test everywhere: after a drain, the MV equals
sigma(left) JOIN right recomputed from the final snapshots."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_dicom_spark.lake.snapshot_table import SnapshotTable
from nifi_dicom_spark.streaming.join_mv import (
    backfill_join_mv,
    create_join_mv,
    join_mv_stream,
)

FACT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("category", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("op_seq", T.LongType(), False),
        T.StructField("offset", T.LongType(), False),
    ]
)
DIM_SCHEMA = T.StructType(
    [
        T.StructField("category", T.StringType(), False),
        T.StructField("label", T.StringType(), True),
        T.StructField("weight", T.DoubleType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("op_seq", T.LongType(), False),
        T.StructField("offset", T.LongType(), False),
    ]
)


def _facts(spark, rows, seq):
    return spark.createDataFrame(
        [(c, cat, v, op, seq, seq) for c, cat, v, op in rows], FACT_SCHEMA
    )


def _dims(spark, rows, seq):
    return spark.createDataFrame(
        [(cat, lab, w, op, seq, seq) for cat, lab, w, op in rows], DIM_SCHEMA
    )


def _mk(spark, tmp_path, how="inner"):
    left = SnapshotTable.create(
        spark, str(tmp_path / "facts"), FACT_SCHEMA, ["conv_id"], n_buckets=4
    )
    right = SnapshotTable.create(
        spark, str(tmp_path / "dims"), DIM_SCHEMA, ["category"], n_buckets=2
    )
    left.merge(
        _facts(
            spark,
            [
                ("c1", "A", 1.0, "insert"),
                ("c2", "A", 2.0, "insert"),
                ("c3", "B", 3.0, "insert"),
                ("c4", "Z", 4.0, "insert"),  # no dimension row (inner: absent)
            ],
            1,
        ),
        op_col="op",
        policy="versioned_upsert",
        commit_keys=[(0, 0)],
    )
    right.merge(
        _dims(
            spark,
            [("A", "alpha", 0.5, "insert"), ("B", "beta", 0.25, "insert")],
            1,
        ),
        op_col="op",
        policy="versioned_upsert",
        commit_keys=[(0, 0)],
    )
    mv = create_join_mv(spark, str(tmp_path / "mv"), left, right, ["category"], how)
    return left, right, mv


def _expected(left, right, how):
    l = left.read().filter("op != 'delete'").select("conv_id", "category", "value")
    r = right.read().filter("op != 'delete'").select("category", "label", "weight")
    return sorted(map(tuple, l.join(r, "category", how).select(
        "conv_id", "category", "value", "label", "weight"
    ).collect()))


def _state(mv):
    return sorted(map(tuple, mv.read().filter("op != 'delete'").select(
        "conv_id", "category", "value", "label", "weight"
    ).collect()))


def test_join_mv_backfill_and_live_maintenance(spark, tmp_path):
    left, right, mv = _mk(spark, tmp_path)
    lv, rv = backfill_join_mv(mv, left, right)
    assert _state(mv) == _expected(left, right, "inner")
    assert ("c4", "Z", 4.0) not in {t[:3] for t in _state(mv)}  # inner drops Z

    q = join_mv_stream(
        spark, left, right, mv, str(tmp_path / "ckpt"), starting_versions=(lv, rv)
    )
    try:
        # fact-side: update c1, delete c2, insert c5 (new B fact)
        left.merge(
            _facts(
                spark,
                [
                    ("c1", "A", 10.0, "update"),
                    ("c2", "A", 0.0, "delete"),
                    ("c5", "B", 5.0, "insert"),
                ],
                2,
            ),
            op_col="op",
            policy="versioned_upsert",
            commit_keys=[(1, 0)],
        )
        q.processAllAvailable()
        assert _state(mv) == _expected(left, right, "inner")
        assert ("c1", "A", 10.0, "alpha", 0.5) in _state(mv)
        assert not any(t[0] == "c2" for t in _state(mv))

        # dimension-side fan-out: relabel A (rewrites c1), DELETE B
        # (inner join: c3 and c5 must drop), insert Z (c4 appears)
        right.merge(
            _dims(
                spark,
                [
                    ("A", "ALPHA", 0.75, "update"),
                    ("B", "beta", 0.0, "delete"),
                    ("Z", "zeta", 1.0, "insert"),
                ],
                2,
            ),
            op_col="op",
            policy="versioned_upsert",
            commit_keys=[(1, 0)],
        )
        q.processAllAvailable()
        got = _state(mv)
        assert got == _expected(left, right, "inner")
        assert ("c1", "A", 10.0, "ALPHA", 0.75) in got
        assert not any(t[1] == "B" for t in got)
        assert ("c4", "Z", 4.0, "zeta", 1.0) in got
    finally:
        q.stop()


def test_join_mv_restart_resumes_exactly_once(spark, tmp_path):
    left, right, mv = _mk(spark, tmp_path)
    lv, rv = backfill_join_mv(mv, left, right)
    ckpt = str(tmp_path / "ckpt")
    q = join_mv_stream(spark, left, right, mv, ckpt, starting_versions=(lv, rv))
    try:
        left.merge(
            _facts(spark, [("c1", "B", 11.0, "update")], 2),  # group move A->B
            op_col="op",
            policy="versioned_upsert",
            commit_keys=[(1, 0)],
        )
        q.processAllAvailable()
        assert ("c1", "B", 11.0, "beta", 0.25) in _state(mv)
    finally:
        q.stop()
    # commits while the stream is DOWN, then resume from the checkpoint
    right.merge(
        _dims(spark, [("B", "BETA", 0.9, "update")], 2),
        op_col="op",
        policy="versioned_upsert",
        commit_keys=[(1, 0)],
    )
    q2 = join_mv_stream(spark, left, right, mv, ckpt)
    try:
        q2.processAllAvailable()
        assert _state(mv) == _expected(left, right, "inner")
        assert ("c1", "B", 11.0, "BETA", 0.9) in _state(mv)
    finally:
        q2.stop()
    # replaying the stream against the same checkpoint is a ledger no-op
    q3 = join_mv_stream(spark, left, right, mv, ckpt)
    try:
        q3.processAllAvailable()
        assert _state(mv) == _expected(left, right, "inner")
    finally:
        q3.stop()


def test_join_mv_left_join_null_fills_instead_of_dropping(spark, tmp_path):
    left, right, mv = _mk(spark, tmp_path, how="left")
    lv, rv = backfill_join_mv(mv, left, right)
    # backfill: the dimension-less Z fact is PRESENT with null enrichment
    assert ("c4", "Z", 4.0, None, None) in _state(mv)
    q = join_mv_stream(
        spark, left, right, mv, str(tmp_path / "ckpt"), starting_versions=(lv, rv)
    )
    try:
        right.merge(
            _dims(spark, [("A", "alpha", 0.0, "delete")], 2),
            op_col="op",
            policy="versioned_upsert",
            commit_keys=[(1, 0)],
        )
        q.processAllAvailable()
        got = _state(mv)
        assert got == _expected(left, right, "left")
        # left join: A facts survive with nulls, not deleted
        assert ("c1", "A", 1.0, None, None) in got
        assert ("c2", "A", 2.0, None, None) in got
    finally:
        q.stop()


def test_create_join_mv_validations(spark, tmp_path):
    left = SnapshotTable.create(
        spark, str(tmp_path / "f"), FACT_SCHEMA, ["conv_id"], n_buckets=2
    )
    right = SnapshotTable.create(
        spark, str(tmp_path / "d"), DIM_SCHEMA, ["category"], n_buckets=2
    )
    with pytest.raises(ValueError, match="how must be"):
        create_join_mv(spark, str(tmp_path / "m1"), left, right, ["category"], "outer")
    with pytest.raises(ValueError, match="right table's key columns"):
        create_join_mv(spark, str(tmp_path / "m2"), left, right, ["label"])
    # payload collision: a dim column named like a fact column
    clash_schema = T.StructType(
        [
            T.StructField("category", T.StringType(), False),
            T.StructField("value", T.DoubleType(), True),  # collides
            T.StructField("op", T.StringType(), True),
            T.StructField("op_seq", T.LongType(), False),
            T.StructField("offset", T.LongType(), False),
        ]
    )
    clash = SnapshotTable.create(
        spark, str(tmp_path / "dc"), clash_schema, ["category"], n_buckets=2
    )
    with pytest.raises(ValueError, match="collide"):
        create_join_mv(spark, str(tmp_path / "m3"), left, clash, ["category"])
    # backfill refuses a non-empty MV
    mv = create_join_mv(spark, str(tmp_path / "m4"), left, right, ["category"])
    left.merge(
        _facts(spark, [("c1", "A", 1.0, "insert")], 1),
        op_col="op",
        policy="versioned_upsert",
        commit_keys=[(0, 0)],
    )
    right.merge(
        _dims(spark, [("A", "alpha", 0.5, "insert")], 1),
        op_col="op",
        policy="versioned_upsert",
        commit_keys=[(0, 0)],
    )
    backfill_join_mv(mv, left, right)
    assert _state(mv) == [("c1", "A", 1.0, "alpha", 0.5)]
    with pytest.raises(ValueError, match="empty MV"):
        backfill_join_mv(mv, left, right)
