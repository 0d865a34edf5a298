#!/usr/bin/env python
"""spark-submit entrypoint for the replay benchmark (BASELINE.json run mode:
``spark-submit --py-files``). Prints one JSON line.

Usage:
    spark-submit --master local[8] --py-files nifi_dicom_spark.zip \
        jobs/replay_job.py --events 9600000 --epochs 2 \
        --input-dir /dev/shm/scaling-input --work-dir /dev/shm/scaling-work

``--input-dir`` points at pre-generated epoch dirs (``events-0`` warm-up,
``events-1..N``) so every parallelism level replays identical bytes.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=9_600_000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--hot-fraction", type=float, default=0.30)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    ap.add_argument("--input-dir", default=None)
    ap.add_argument("--work-dir", default=None)
    ap.add_argument(
        "--write-codec",
        default="snappy",
        help="parquet codec for the engine's own delta/base writes "
        "(snappy|zstd|uncompressed) — the codec-matrix knob",
    )
    ap.add_argument(
        "--stage-metrics",
        action="store_true",
        help="report total executor run/CPU time via the UI REST API "
        "(separates engine scaling from host scheduling jitter)",
    )
    args = ap.parse_args()

    # master/memory/java-opts come from spark-submit; only CDC knobs here.
    # n_buckets and shuffle partitions are FIXED across parallelism levels —
    # they are properties of the table layout / workload, not the cluster, so
    # the N-vs-4N comparison runs the identical logical job.
    spark = (
        SparkSession.builder.appName("replay-bench")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", str(args.stage_metrics).lower())
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.parquet.compression.codec", args.write_codec)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from nifi_dicom_spark.bench_core import run_replay

    input_dirs = None
    if args.input_dir:
        # numeric epoch sort — lexicographic would replay events-10 before
        # events-2 for 10+ unpadded epochs
        input_dirs = sorted(
            (
                os.path.join(args.input_dir, d)
                for d in os.listdir(args.input_dir)
                if d.startswith("events-")
            ),
            key=lambda p: int(p.rsplit("-", 1)[-1]),
        )
        assert len(input_dirs) == args.epochs + 1, input_dirs

    result = run_replay(
        spark,
        n_events=args.events,
        n_epochs=args.epochs,
        n_buckets=args.n_buckets,
        work_dir=args.work_dir,
        input_dirs=input_dirs,
        hot_fraction=args.hot_fraction,
    )
    if args.stage_metrics:
        try:
            import urllib.request

            # this driver's own UI (4040 may belong to another app if taken)
            ui = spark.sparkContext.uiWebUrl
            app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0][
                "id"
            ]
            stages = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app}/stages?status=complete"
                )
            )
            result["executor_run_s"] = round(
                sum(s["executorRunTime"] for s in stages) / 1000, 1
            )
            result["executor_cpu_s"] = round(
                sum(s.get("executorCpuTime", 0) for s in stages) / 1e9, 1
            )
        except Exception as e:  # metrics are best-effort
            result["stage_metrics_error"] = str(e)[:200]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
