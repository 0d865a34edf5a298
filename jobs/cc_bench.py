#!/usr/bin/env python
"""Perf datapoint for connected_groups at graph scale (VERDICT r2 item 7).

Builds a 10^6-edge graph that stresses both convergence dimensions:
* one 2^17-node CHAIN (diameter 131072 — worst case for plain label
  propagation; pointer doubling must close it in O(log d) rounds), and
* ~875k random intra-cluster edges over 100k clusters of 10 nodes
  (bulk shuffle volume).

Prints rounds, wall seconds, and per-round timings; paste into
BENCH/BASELINE.md. Run: python jobs/cc_bench.py [n_random_edges]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nifi_dicom_spark.operators.merge_context import connected_groups
from nifi_dicom_spark.session import get_spark


def main() -> None:
    n_random = int(sys.argv[1]) if len(sys.argv) > 1 else 875_000
    chain_n = 1 << 17
    spark = get_spark(app_name="cc-bench")

    chain = spark.range(chain_n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    # random edges inside 10-node clusters: node ids 10^7 + cluster*10 + slot
    rnd = spark.range(n_random).select(
        (
            F.lit(10_000_000)
            + (F.pmod(F.xxhash64("id"), 100_000)) * 10
            + F.pmod(F.xxhash64(F.col("id") + 1), 10)
        ).alias("src"),
        (
            F.lit(10_000_000)
            + (F.pmod(F.xxhash64("id"), 100_000)) * 10
            + F.pmod(F.xxhash64(F.col("id") + 2), 10)
        ).alias("dst"),
    )
    edges = chain.unionByName(rnd).localCheckpoint(eager=True)
    n_edges = edges.count()

    rounds: list[dict] = []

    def on_round(rnd: int, changed: int, secs: float) -> None:
        rounds.append(
            {"round": rnd, "changed": changed, "sec": round(secs, 2)}
        )
        print(f"round {rnd}: changed={changed} sec={secs:.2f}", flush=True)

    t0 = time.monotonic()
    labels = connected_groups(edges, max_iterations=30, on_round=on_round)
    n_components = labels.select("component").distinct().count()
    wall = time.monotonic() - t0

    # correctness spot-checks: the chain is ONE component labeled 0; the
    # random clusters can merge only within their 10-node id range
    chain_labels = labels.filter(F.col("node") < chain_n)
    assert chain_labels.select("component").distinct().count() == 1
    assert chain_labels.filter(F.col("component") != 0).count() == 0

    print(
        {
            "n_edges": n_edges,
            "chain_diameter": chain_n,
            "n_components": n_components,
            "n_rounds": len(rounds),
            "wall_sec": round(wall, 2),
            "rounds": rounds,
        }
    )
    spark.stop()


if __name__ == "__main__":
    main()
