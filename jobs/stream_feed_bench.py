#!/usr/bin/env python
"""Stream-feed scaling bench: drain the ``snapshot_cdf`` source repeatedly
and report best-steady-drain throughput — the streaming analog of
BENCH/BASELINE.md's best-steady-epoch estimator (host noise is one-sided,
so the best of repeated identical drains estimates capability; every raw
sample is printed).

Usage (fresh JVM per parallelism level; the first invocation builds the
table, later ones reuse it so both levels drain the IDENTICAL bytes):

    PYTHONPATH=. python jobs/stream_feed_bench.py \
        --table /dev/shm/feed-table --cpus 8 --mode upserts --drains 3

Prints ONE JSON line: per-drain rows/sec (data-batch time, i.e. the sum of
triggerExecution over row-carrying batches — both levels pay the same
fixed stream-startup cost, which would otherwise mask scaling), wall
seconds, and the best drain.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--events", type=int, default=1_200_000)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--mode", default="upserts", choices=["cdf", "upserts"])
    ap.add_argument("--drains", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault(
        "SPARK_GRAFT_JAVA_OPTS",
        f"-Xms{os.environ.get('SPARK_DRIVER_MEM', '16g')} -XX:+AlwaysPreTouch "
        "-XX:+UseParallelGC",
    )
    from nifi_dicom_spark.session import get_spark

    spark = get_spark(app_name="stream-feed-bench", cpus=args.cpus)

    from nifi_dicom_spark.bench_core import generate_epoch_dirs
    from nifi_dicom_spark.lake.snapshot_table import SnapshotTable
    from nifi_dicom_spark.operators.apply import (
        apply_changes,
        create_transcripts_table,
    )
    from nifi_dicom_spark.sources.changelog import read_change_log
    from nifi_dicom_spark.sources.table_stream import SnapshotCDFDataSource

    if not os.path.isdir(os.path.join(args.table, "meta")):
        # merge-on-read epochs, NO compaction — upserts mode streams the
        # delta files each commit appended
        work = tempfile.mkdtemp(prefix="feed-input-")
        try:
            dirs = generate_epoch_dirs(work, args.events, args.epochs, 0.30, 7)
            table = create_transcripts_table(
                spark, args.table, n_buckets=args.buckets
            )
            for e, d in enumerate(dirs):
                apply_changes(table, read_change_log(spark, d), epoch=e)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    else:
        table = SnapshotTable.load(spark, args.table)

    spark.dataSource.register(SnapshotCDFDataSource)
    drains = []
    for i in range(args.drains):
        ck = tempfile.mkdtemp(prefix=f"feed-ck-{i}-")
        try:
            feed = (
                spark.readStream.format("snapshot_cdf")
                .option("path", args.table)
                .option("startingVersion", 0)
                .option("mode", args.mode)
                .load()
            )
            t0 = time.monotonic()
            q = (
                feed.writeStream.format("noop")
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.monotonic() - t0
            prog = [json.loads(p.json) for p in q.recentProgress]
            rows = sum(p["numInputRows"] for p in prog)
            batch_s = (
                sum(
                    p["durationMs"]["triggerExecution"]
                    for p in prog
                    if p["numInputRows"] > 0
                )
                / 1000.0
            )
            drains.append(
                {
                    "rows": rows,
                    "wall_s": round(wall, 3),
                    "data_batch_s": round(batch_s, 3),
                    "rows_per_sec": round(rows / batch_s, 1) if batch_s else None,
                }
            )
        finally:
            shutil.rmtree(ck, ignore_errors=True)

    rates = [d["rows_per_sec"] for d in drains if d["rows_per_sec"]]
    best = max(rates) if rates else None  # still print the raw samples
    print(
        json.dumps(
            {
                "mode": args.mode,
                "cpus": args.cpus,
                "table_version": table.current_version(),
                "drains": drains,
                "best_rows_per_sec": best,
            }
        )
    )


if __name__ == "__main__":
    main()
