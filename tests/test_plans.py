"""Physical-plan assertions: the optimizations we rely on at 100 TB must be
visible in `.explain` output, not assumed.

* LWW dedup is an aggregation with map-side partial combine (two
  HashAggregate/ObjectHashAggregate nodes around one Exchange) — the
  hot-key collapse that makes celebrity conversations shuffle O(tasks) rows,
  not O(events).
* Dimension probes broadcast (no sort-merge shuffle of the fact side).
* Filters and projections reach the parquet scan (PushedFilters/ReadSchema).
* The pre-merge pipeline stays inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_lww_dedup_is_partial_aggregated(spark):
    from nifi_dicom_spark.operators.dedup import lww_dedup

    df = spark.range(0, 1000).select(
        (F.col("id") % 7).alias("conv_id"),
        (F.col("id") % 3).cast("int").alias("turn_idx"),
        F.col("id").alias("op_seq"),
        F.col("id").alias("offset"),
        F.col("id").cast("string").alias("text"),
    )
    plan = _plan(lww_dedup(df, ["conv_id", "turn_idx"]))
    # max_by over a struct buffer plans as SortAggregate (struct agg buffers
    # are not hash-mutable); the invariant that matters for skew is the
    # PARTIAL aggregate below the exchange — hot keys collapse map-side
    n_agg = len(re.findall(r"(?:Hash|Sort|ObjectHash)Aggregate", plan))
    assert n_agg >= 2, f"expected partial+final aggregate, plan:\n{plan}"
    assert "partial_max_by" in plan, f"no map-side combine in plan:\n{plan}"
    # exactly one shuffle between the partial and final aggregates
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_clustered_merge_reduce_is_single_exchange(spark):
    """The versioned-merge formulation: repartition(n, conv_id) = bucket
    placement AND the only shuffle — the LWW reduce's groupBy(conv_id,
    turn_idx) must reuse the conv_id clustering (HashPartitioning on a
    subset of the grouping keys satisfies ClusteredDistribution), so the
    full-payload rows cross the wire exactly once per epoch."""
    from nifi_dicom_spark.operators.dedup import lww_dedup

    df = spark.range(0, 1000).select(
        (F.col("id") % 7).cast("string").alias("conv_id"),
        (F.col("id") % 3).cast("int").alias("turn_idx"),
        F.col("id").alias("op_seq"),
        F.col("id").alias("offset"),
        F.col("id").cast("string").alias("text"),
    )
    merged = lww_dedup(df.repartition(16, "conv_id"), ["conv_id", "turn_idx"])
    plan = _plan(merged)
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    assert "REPARTITION_BY_NUM" in plan  # AQE never coalesces it


def test_hierarchy_query_broadcasts_dimension(spark):
    import __spark_entry__ as E

    plan = _plan(E.q_hierarchy_query(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan


def test_filter_and_projection_pushdown(spark):
    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .filter(F.col("l_quantity") > 10)
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(m.group(1).split(",")) == {
        "l_orderkey:bigint",
        "l_quantity:double",
    }, f"scan reads more columns than projected: {m and m.group(1)}"


def test_premerge_pipeline_is_codegenned(spark):
    """route → reconcile fuses into the scan inside one WholeStageCodegen."""
    import pandas as pd

    from nifi_dicom_spark.fixtures.generator import GeneratorConfig, generate_change_events
    from nifi_dicom_spark.model import CHANGE_EVENTS_SCHEMA
    from nifi_dicom_spark.operators.apply import plan_upserts

    pdf = generate_change_events(GeneratorConfig(seed=3, n_events=200))
    ev = spark.createDataFrame(pdf, schema=CHANGE_EVENTS_SCHEMA)
    # codegen explain can't descend an unexecuted AdaptiveSparkPlan — build
    # the static plan for the shape check (AQE changes scheduling, not shape)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = plan_upserts(ev)
        plan = _plan(df)
        codegen = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "codegen"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", codegen)
    assert m and int(m.group(1)) >= 1, codegen[:300]
    # the whole thing is one aggregation: no join, no extra exchanges
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_plan_coalesce_safe_detection(spark, tmp_path):
    """The bucket-file write only mutates the session AQE conf when the
    explicit REPARTITION_BY_NUM was elided from the plan: a normal clustered
    write is detected as safe (no global toggle), an un-repartitioned plan
    is not, and disabling AQE coalescing globally makes everything safe."""
    from pyspark.sql import types as T

    from nifi_dicom_spark.lake.snapshot_table import SnapshotTable

    schema = T.StructType(
        [
            T.StructField("k", T.StringType(), False),
            T.StructField("v", T.LongType(), True),
        ]
    )
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), schema, key_cols=["k"], n_buckets=4
    )
    base = spark.range(100).select(
        F.col("id").cast("string").alias("k"), F.col("id").alias("v")
    )
    clustered = base.repartition(4, "k").sortWithinPartitions("k")
    assert table._plan_coalesce_safe(clustered)  # REPARTITION_BY_NUM survives
    assert not table._plan_coalesce_safe(base)  # no explicit repartition
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        assert table._plan_coalesce_safe(base)  # nothing to protect against
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")

    # The hazard case: OUR final repartition(4, k) is elided by an upstream
    # ENSURE_REQUIREMENTS exchange (agg on the key at shuffle.partitions ==
    # n_buckets), while an UNRELATED repartition-by-num survives deeper in
    # the plan (kernel-parallelism .repartition(8)). The decision must come
    # from the topmost shuffle exchange — a whole-plan substring search
    # would wrongly report safe here.
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        agg = base.repartition(8).groupBy("k").agg(F.max("v").alias("v"))
        elided = agg.repartition(4, "k").sortWithinPartitions("k")
        plan = elided._jdf.queryExecution().executedPlan().toString()
        assert "REPARTITION_BY_NUM" in plan  # the decoy is present
        assert not table._plan_coalesce_safe(elided)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
