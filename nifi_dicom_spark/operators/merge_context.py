"""Group-context merge — priority merge of grouped records (SURVEY §2.5 A2/A3).

Reference: ``MergeCompositeContext`` groups instances by shared study UID and
merges group context with two rules (``apps/MergeCompositeContext.java``):
* earliest group (lowest sequence number) takes priority (``:149-155``),
* within a merge, non-empty values override empty/dummy ones per attribute
  (``:120-144``).

Spark shape: ``min_by`` / ``first(ignorenulls)`` over an ordered aggregation —
one shuffle with map-side combine. (True union-find connected components is
out of engine scope; direct keys suffice — SURVEY A2.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def priority_merge(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str,
    value_cols: list[str],
    empty_is_null: bool = True,
) -> DataFrame:
    """One row per key: for each value column, the value of the
    lowest-sequence record that has a non-null (and, optionally, non-empty)
    value — 'earliest wins, but never pick a dummy over a real value'."""
    aggs = []
    for c in value_cols:
        v = F.col(c)
        if empty_is_null:
            v = F.when(F.trim(v.cast("string")) == "", None).otherwise(v)
        # min_by over rows where the value exists: NULL values are excluded
        # by replacing their ordering key with +inf via a null-safe struct
        aggs.append(
            F.min_by(v, F.when(v.isNotNull(), F.col(seq_col))).alias(c)
        )
    return df.groupBy(*key_cols).agg(*aggs)


def connected_groups(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    checkpoint_every: int = 4,
    on_round=None,
) -> DataFrame:
    """Connected components over an undirected edge list — the full
    ``MergeCompositeContext.addToGroups`` semantics (groups united by ANY
    shared identifier, colliding groups merged transitively via hash-map
    union, ``apps/MergeCompositeContext.java:171-239``).

    Spark-first shape: iterative label propagation with a pointer-doubling
    shortcut — every node adopts the minimum label in its neighborhood, then
    additionally adopts *its label's* label (path halving). The shortcut
    makes convergence O(log diameter) rounds instead of O(diameter), so the
    default iteration bound covers graphs of astronomical diameter (2^20+
    node chains). Each round is two self-joins + one aggregation (all
    shuffling on the node id, so AQE reuses the partitioning). Returns
    (node, component) with component = min node id of the group.

    Driver-side loop is bounded and data-independent per round — no
    ``collect`` of node data; only the convergence check (a count) touches
    the driver. If the bound is ever exhausted before the fixpoint, this
    RAISES rather than silently returning a wrong grouping.

    Big-graph hygiene: the symmetrized edge frame is built once and
    **persisted** for the whole loop (every round joins against it — without
    the persist each of the O(log d) rounds re-derives it from source), and
    labels are **eagerly checkpointed every** ``checkpoint_every`` rounds
    (lazy checkpoints otherwise stack O(rounds) of un-truncated lineage
    between materializations; at 10^9 edges that is re-planned per action).
    ``on_round(round_idx, n_changed, seconds)`` is an optional telemetry
    hook (the perf harness builds its rounds×time table from it).
    """
    import time as _time

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # undirected + self edges so isolated endpoints keep their own label
    sym = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.unionByName(
        sym.select("a").distinct().select(F.col("a"), F.col("a").alias("b"))
    )
    # consumed twice per round (candidate join + nothing else re-derives it)
    # for up to O(log diameter) rounds — persist once, release at exit
    sym = sym.persist()
    try:
        labels = sym.select("a").distinct().select(
            F.col("a").alias("node"), F.col("a").alias("component")
        )
        converged = False
        for rnd in range(max_iterations):
            _t0 = _time.monotonic()
            # candidate label per node: min over neighbors' current labels
            cand = (
                sym.join(labels, sym.b == labels.node)
                .groupBy(sym.a.alias("node"))
                .agg(F.min("component").alias("new_component"))
            )
            joined = labels.join(cand, on="node", how="left").select(
                "node",
                "component",
                F.least(
                    F.col("component"), F.col("new_component")
                ).alias("new_component"),
            )
            changed = joined.filter(
                F.col("new_component") < F.col("component")
            ).count()
            stepped = joined.select("node", F.col("new_component").alias("component"))
            # pointer-doubling shortcut: adopt the label of your label (labels
            # are always node ids, so the self-join always hits)
            lab2 = stepped.select(
                F.col("node").alias("_n2"), F.col("component").alias("_c2")
            )
            labels = stepped.join(lab2, stepped.component == lab2._n2, "left").select(
                "node",
                F.least(F.col("component"), F.col("_c2")).alias("component"),
            )
            # eager checkpoint every k rounds truncates lineage NOW (the
            # convergence count above already paid for the round's compute);
            # off-rounds stay lazy — materialized by the next round's count
            eager = checkpoint_every > 0 and (rnd + 1) % checkpoint_every == 0
            labels = labels.localCheckpoint(eager=eager)
            if on_round is not None:
                on_round(rnd, changed, _time.monotonic() - _t0)
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"connected_groups did not converge in {max_iterations} iterations"
            )
        # materialize before releasing sym (labels' plan may reference it)
        labels = labels.localCheckpoint(eager=True)
    finally:
        sym.unpersist()
    return labels
