#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real multi-executor cluster exists in this sandbox, so — per the driver's
instruction — the same job runs at two parallelism levels (local[8] vs
local[32]) on the same input size via ``spark-submit --py-files``, each in a
fresh JVM. Writes BENCH/BASELINE.md with events/sec at both + scaling
efficiency = (throughput@4N / throughput@N) / 4.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.abspath(__file__))


def zip_package(out: str) -> str:
    pkg = os.path.join(REPO, "nifi_dicom_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    z.write(p, os.path.relpath(p, REPO))
    return out


def run_at(cores: int, pyz: str, events: int, epochs: int) -> dict:
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    cmd = [
        spark_submit,
        "--master",
        f"local[{cores}]",
        "--driver-memory",
        os.environ.get("SPARK_DRIVER_MEM", "16g"),
        "--py-files",
        pyz,
        os.path.join(REPO, "jobs", "replay_job.py"),
        "--events",
        str(events),
        "--epochs",
        str(epochs),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and "events_per_sec" in line:
            return json.loads(line)
    raise RuntimeError(
        f"no result line from spark-submit at local[{cores}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    events = int(os.environ.get("SCALING_EVENTS", "600000"))
    epochs = int(os.environ.get("SCALING_EPOCHS", "4"))
    n, four_n = 8, 32
    pyz = zip_package("/tmp/nifi_dicom_spark.zip")

    r_n = run_at(n, pyz, events, epochs)
    r_4n = run_at(four_n, pyz, events, epochs)
    eff = (r_4n["events_per_sec"] / r_n["events_per_sec"]) / (four_n / n)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — replay throughput at two parallelism levels

Sandbox proxy for the N→4N-executor scaling rule (no real cluster available):
the SAME replay job (same input size, fresh JVM each) via
`spark-submit --master local[{{N}}] --py-files nifi_dicom_spark.zip
jobs/replay_job.py`, at local[{n}] (N) and local[{four_n}] (4N).

Workload: {events:,} change events in {epochs} timed epochs (after a warm-up
epoch), 30% of events on 3 hot conversations, 5% duplicate op_seq, 10% late,
1% malformed, mid-stream schema change in epoch 1. Full pipeline per epoch:
route → schema-reconcile → salable LWW reduce → bucket-pruned MERGE into the
snapshot table with commit-ledger idempotency + lineage metrics.

| parallelism | events | seconds | events/sec |
|---|---|---|---|
| local[{n}] (N) | {r_n['events']:,} | {r_n['seconds']} | {r_n['events_per_sec']:,} |
| local[{four_n}] (4N) | {r_4n['events']:,} | {r_4n['seconds']} | {r_4n['events_per_sec']:,} |

**Scaling efficiency** = (throughput@4N / throughput@N) / 4 =
({r_4n['events_per_sec']:,} / {r_n['events_per_sec']:,}) / 4 = **{eff:.3f}**
(target ≥ 0.8 per BASELINE.json).

Caveats, reported honestly: `local[N]` shares one JVM/heap and has no shuffle
network, so this measures compute/shuffle-partition scaling, not network or
multi-node coordination. The design levers that carry to a real 1000-executor
cluster: aggregation-based LWW dedup (map-side partial combine ⇒ hot keys
collapse before the exchange), bucket-pruned copy-on-write merges (cost ∝
change set, not table size), AQE coalescing/skew-split, and commit-ledger
idempotency that is O(1) per epoch.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"n": r_n, "four_n": r_4n, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
