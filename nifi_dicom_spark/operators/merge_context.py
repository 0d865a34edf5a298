"""Group-context merge — priority merge of grouped records (SURVEY §2.5 A2/A3).

Reference: ``MergeCompositeContext`` groups instances by shared study UID and
merges group context with two rules (``apps/MergeCompositeContext.java``):
* earliest group (lowest sequence number) takes priority (``:149-155``),
* within a merge, non-empty values override empty/dummy ones per attribute
  (``:120-144``).

Spark shape: ``min_by`` / ``first(ignorenulls)`` over an ordered aggregation —
one shuffle with map-side combine. ``connected_groups`` covers the
transitive-merge half (groups united by ANY shared identifier — SURVEY A2):
adaptive between driver-side union-find for small edge lists and iterative
label propagation with pointer doubling for big graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def priority_merge(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str,
    value_cols: list[str],
    empty_is_null: bool = True,
) -> DataFrame:
    """One row per key: for each value column, the value of the
    lowest-sequence record that has a non-null (and, optionally, non-empty)
    value — 'earliest wins, but never pick a dummy over a real value'.

    Ties on ``seq_col`` break by the value's string form, so the output is
    a pure function of the data: bare ``min_by`` picks an arbitrary row on
    ordering ties (partition/task order), which would violate the engine's
    replay-determinism contract whenever ``seq_col`` is not unique per key.
    """
    aggs = []
    for c in value_cols:
        v = F.col(c)
        if empty_is_null:
            v = F.when(F.trim(v.cast("string")) == "", None).otherwise(v)
        # min_by over rows where the value exists: NULL ordering keys are
        # excluded from the aggregate; (seq, value) struct = deterministic
        aggs.append(
            F.min_by(
                v,
                F.when(
                    v.isNotNull(), F.struct(F.col(seq_col), v.cast("string"))
                ),
            ).alias(c)
        )
    return df.groupBy(*key_cols).agg(*aggs)


def _connected_groups_driver(e: DataFrame) -> DataFrame:
    """Union-find on the driver for sub-threshold edge lists.

    The caller has already counted the edges, so memory is bounded by the
    threshold (100k edges ≈ a few MB) — this is NOT an O(data) collect; it
    is the same runtime-adaptive philosophy as AQE's broadcast decision.
    Union-find with path halving is O(E α(E)) total, versus O(log d)
    distributed rounds at a fixed ~0.5 s of scheduling + shuffle each: on
    the near-dup-cluster graphs a corpus actually yields (pairs ≪ docs),
    this path is ~5–10× faster end-to-end.
    """
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for r in e.collect():
        a, b = r["a"], r["b"]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    out = [(n, comp_min[find(n)]) for n in parent]
    dt = e.schema["a"].dataType
    schema = T.StructType(
        [T.StructField("node", dt), T.StructField("component", dt)]
    )
    return e.sparkSession.createDataFrame(out, schema)


def connected_groups(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    checkpoint_every: int = 4,
    on_round=None,
    driver_threshold: int = 100_000,
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

    Adaptive: edge lists at or under ``driver_threshold`` take a driver-side
    union-find (bounded by the threshold — see
    :func:`_connected_groups_driver`); larger graphs run the distributed
    loop, whose driver traffic is bounded and data-independent per round —
    only the convergence check (a count) touches the driver. If the
    iteration bound is exhausted before the fixpoint, this RAISES rather
    than silently returning a wrong grouping.

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
    # Adaptive small-graph path (AQE-style runtime decision): near-dup pair
    # graphs are usually tiny relative to the corpus, and every distributed
    # round costs a fixed scheduling + shuffle overhead. One cheap count
    # decides; at ≤ driver_threshold edges union-find on the driver wins by
    # 5–10×, above it the iterative loop is the only memory-safe option.
    # The count re-scans `edges` once — callers feed checkpointed pair
    # frames, so this is a cached-materialization scan, not a recompute.
    # (`on_round` only fires on the distributed path; set
    # driver_threshold=0 to force it.)
    if driver_threshold > 0 and e.count() <= driver_threshold:
        return _connected_groups_driver(e)
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
