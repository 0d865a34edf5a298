#!/usr/bin/env python
"""spark-submit entrypoint for the replay benchmark (BASELINE.json run mode:
``spark-submit --py-files``). Prints one JSON line.

Usage:
    spark-submit --master local[8] --py-files nifi_dicom_spark.zip \
        jobs/replay_job.py --events 600000 --epochs 4
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=600_000)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--hot-fraction", type=float, default=0.30)
    args = ap.parse_args()

    # master comes from spark-submit; only tune the CDC-relevant knobs here
    spark = (
        SparkSession.builder.appName("replay-bench")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(max(8, 2 * cores)))

    from nifi_dicom_spark.bench_core import run_replay

    result = run_replay(
        spark, n_events=args.events, n_epochs=args.epochs, hot_fraction=args.hot_fraction
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
