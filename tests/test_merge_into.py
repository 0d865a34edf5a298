"""Conditional MERGE INTO (Delta-style WHEN clauses) on SnapshotTable."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nifi_dicom_spark.lake.snapshot_table import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.IntegerType(), True),
        T.StructField("note", T.StringType(), True),
    ]
)


def _table(spark, tmp_path, rows=(("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z"))):
    tab = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"], n_buckets=4
    )
    tab.overwrite(spark.createDataFrame(list(rows), SCHEMA))
    return tab


def test_clause_semantics(spark, tmp_path):
    tab = _table(spark, tmp_path)
    src = spark.createDataFrame(
        [("a", 10, "del"), ("b", 1, "upd"), ("d", 40, "new"), ("e", 5, "skip")],
        "k string, v int, flag string",
    )
    stats = tab.merge_into(
        src,
        when_matched_update={"v": "s.v + t.v", "note": F.lit("updated")},
        update_condition="s.v < t.v",
        delete_condition="s.flag = 'del'",
        insert_condition="s.v >= 10",
    )
    assert stats.applied and stats.mode == "cow"
    got = sorted((r.k, r.v, r.note) for r in tab.read().collect())
    # a deleted; b updated (1 < 2); c untouched; d inserted (missing source
    # column 'note' -> null); e's insert declined
    assert got == [("b", 3, "updated"), ("c", 3, "z"), ("d", 40, None)]


def test_delete_clause_wins_over_update(spark, tmp_path):
    tab = _table(spark, tmp_path)
    src = spark.createDataFrame([("a", 0, "both")], "k string, v int, flag string")
    tab.merge_into(
        src,
        when_matched_update={"v": F.lit(99)},
        delete_condition="s.flag = 'both'",  # matches the same row
    )
    assert sorted(r.k for r in tab.read().collect()) == ["b", "c"]


def test_matched_rows_missing_every_clause_survive_unchanged(spark, tmp_path):
    tab = _table(spark, tmp_path)
    src = spark.createDataFrame([("a", -1, "x"), ("f", 9, "x")], "k string, v int, flag string")
    tab.merge_into(
        src,
        when_matched_update={"v": "s.v"},
        update_condition="s.v > 0",  # a fails the condition -> kept as-is
        when_not_matched_insert=False,  # f ignored
    )
    got = sorted((r.k, r.v) for r in tab.read().collect())
    assert got == [("a", 1), ("b", 2), ("c", 3)]


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    tab = _table(spark, tmp_path)
    before = dict(tab.manifest()["files"])
    src = spark.createDataFrame([("a", 5, "u")], "k string, v int, flag string")
    tab.merge_into(src, when_matched_update={"v": "s.v"})
    after = tab.manifest()["files"]
    touched = {
        b for b in before if before[b] != after.get(b)
    }
    assert len(touched) == 1  # only a's bucket rewritten
    for b in before:
        if b not in touched:
            assert after[b] == before[b]
            for rel in before[b]:
                assert os.path.exists(os.path.join(tab.data_dir, rel))


def test_validation_errors(spark, tmp_path):
    tab = _table(spark, tmp_path)
    src = spark.createDataFrame([("a", 1, "f")], "k string, v int, flag string")
    with pytest.raises(ValueError, match="at least one WHEN clause"):
        tab.merge_into(src, when_not_matched_insert=False)
    with pytest.raises(ValueError, match="ambiguous"):
        tab.merge_into(
            src, when_matched_update={"v": "s.v"}, when_matched_delete=True
        )
    with pytest.raises(ValueError, match="unknown columns"):
        tab.merge_into(src, when_matched_update={"nope": "s.v"})
    dup = src.unionByName(src)
    with pytest.raises(ValueError, match="duplicate keys"):
        tab.merge_into(
            dup, when_matched_update={"v": "s.v"}, assert_unique_source=True
        )


def test_commit_key_replay_is_noop(spark, tmp_path):
    tab = _table(spark, tmp_path)
    src = spark.createDataFrame([("a", 100, "u")], "k string, v int, flag string")
    s1 = tab.merge_into(src, when_matched_update={"v": "s.v"}, commit_keys=[(1, 0)])
    assert s1.applied
    s2 = tab.merge_into(
        src, when_matched_update={"v": F.lit(-1)}, commit_keys=[(1, 0)]
    )
    assert not s2.applied and s2.skipped_commit_keys == 1
    assert {r.k: r.v for r in tab.read().collect()}["a"] == 100
