#!/usr/bin/env python
"""Benchmark runner. Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric: wall-clock of the engine's flagship workload — a full CDC
replay (generate-once change log derived deterministically from the sf dir
size, ~2 events/row of lineitem) through route→reconcile→dedup→merge into the
snapshot lake table — plus per-query timings of every __spark_entry__ query
at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

`value` = total seconds of the headline replay; `queries` carries per-query
seconds (the driver compares these against BASELINE.md). Events/sec of the
replay is reported inside "extra".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as entry_mod
    from nifi_dicom_spark.fixtures.generator import (
        GeneratorConfig,
        generate_change_events,
        write_event_files,
    )
    from nifi_dicom_spark.operators.apply import (
        apply_changes,
        create_transcripts_table,
        read_final_state,
    )
    from nifi_dicom_spark.session import get_spark

    spark = get_spark(app_name="bench", cpus=cpus)

    timings: dict[str, float] = {}

    # --- headline: sustained CDC replay ------------------------------------
    # deterministic scale: ~600k events at sf0.1 (≈ lineitem rows), applied
    # as 4 epochs into a growing table AFTER a warm-up epoch (JVM/codegen
    # warm-up is one-time; the 10^10-event target runs steady-state)
    n_events = max(20_000, int(6_000_000 * sf)) if sf > 0 else 100_000
    n_epochs = 4
    work = tempfile.mkdtemp(prefix="bench-")
    from nifi_dicom_spark.sources.changelog import read_change_log

    try:
        per_epoch = n_events // n_epochs
        dirs = []
        for e in range(n_epochs + 1):  # +1 warm-up
            cfg = GeneratorConfig(
                seed=42 + e,
                n_conversations=max(100, n_events // 50),
                max_turns=20,
                n_events=per_epoch if e else max(5_000, per_epoch // 10),
                duplicate_ratio=0.05,
                late_ratio=0.10,
                hot_fraction=0.30,
                n_hot=3,
                malformed_ratio=0.01,
                schema_change_at=(per_epoch // 2) if e == 1 else 0,
            )
            d = os.path.join(work, f"events-{e}")
            write_event_files(generate_change_events(cfg), d, n_files=max(8, cpus))
            dirs.append(d)

        table = create_transcripts_table(
            spark, os.path.join(work, "transcripts"), n_buckets=2 * cpus
        )
        apply_changes(table, read_change_log(spark, dirs[0]), epoch=0)  # warm-up

        t0 = time.monotonic()
        for e in range(1, n_epochs + 1):
            apply_changes(table, read_change_log(spark, dirs[e]), epoch=e)
        replay_sec = time.monotonic() - t0
        n_final = read_final_state(table).count()
        timings["cdc_replay"] = round(replay_sec, 3)
        events_per_sec = (per_epoch * n_epochs) / replay_sec
        n_events = per_epoch * n_epochs
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # --- per-query timings ------------------------------------------------
    for name, fn in entry_mod.queries().items():
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)

    total = sum(timings.values())
    print(
        json.dumps(
            {
                "metric": "cdc_replay_plus_query_suite_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": {
                    "replay_events": n_events,
                    "replay_events_per_sec": round(events_per_sec, 1),
                    "replay_final_rows": n_final,
                    "cpus": cpus,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
