"""Reusable replay benchmark: sustained change-events/sec applied to the
transcripts lake table (the BASELINE.json headline metric).

Methodology: one warm-up epoch (JVM/codegen warm-up is one-time; the
10^10-event production run is steady-state), then N timed epochs applied to a
growing table. Events/sec = total timed events / total timed seconds.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession


def run_replay(
    spark: SparkSession,
    n_events: int,
    n_epochs: int = 4,
    n_buckets: int | None = None,
    work_dir: str | None = None,
    hot_fraction: float = 0.30,
    seed: int = 42,
) -> dict:
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
    from nifi_dicom_spark.sources.changelog import read_change_log

    cpus = spark.sparkContext.defaultParallelism
    if n_buckets is None:
        n_buckets = 2 * cpus
    work = work_dir or tempfile.mkdtemp(prefix="replay-bench-")
    per_epoch = n_events // n_epochs
    try:
        dirs = []
        for e in range(n_epochs + 1):  # epoch 0 is warm-up
            cfg = GeneratorConfig(
                seed=seed + e,
                n_conversations=max(100, n_events // 50),
                max_turns=20,
                n_events=per_epoch if e else max(5_000, per_epoch // 10),
                duplicate_ratio=0.05,
                late_ratio=0.10,
                hot_fraction=hot_fraction,
                n_hot=3,
                malformed_ratio=0.01,
                schema_change_at=(per_epoch // 2) if e == 1 else 0,
            )
            d = os.path.join(work, f"events-{e}")
            write_event_files(generate_change_events(cfg), d, n_files=max(8, cpus))
            dirs.append(d)

        table = create_transcripts_table(
            spark, os.path.join(work, "transcripts"), n_buckets=n_buckets
        )
        apply_changes(table, read_change_log(spark, dirs[0]), epoch=0)

        t0 = time.monotonic()
        for e in range(1, n_epochs + 1):
            apply_changes(table, read_change_log(spark, dirs[e]), epoch=e)
        elapsed = time.monotonic() - t0
        n_final = read_final_state(table).count()
    finally:
        if work_dir is None:
            shutil.rmtree(work, ignore_errors=True)

    total = per_epoch * n_epochs
    return {
        "events": total,
        "epochs": n_epochs,
        "seconds": round(elapsed, 3),
        "events_per_sec": round(total / elapsed, 1),
        "final_rows": n_final,
        "cpus": cpus,
        "n_buckets": n_buckets,
    }
