#!/usr/bin/env python
"""spark-submit entrypoint for snapshot-table maintenance: fold merge-on-read
delta files back into base files and (optionally) vacuum unreferenced data.

This is the background job that bounds read amplification at scale — the
ingest hot path only ever appends deltas (epoch cost ∝ change set), and this
job amortizes the base rewrites off the ingest critical path, exactly like a
lakehouse compaction service.

Usage:
    spark-submit --py-files nifi_dicom_spark.zip jobs/compact_job.py \
        --table /path/to/transcripts [--min-deltas 1] [--buckets 3,17] \
        [--vacuum-keep 2]

Prints one JSON line with the new version and before/after file counts.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--min-deltas", type=int, default=1)
    ap.add_argument("--buckets", default=None, help="comma-separated bucket ids")
    ap.add_argument(
        "--vacuum-keep",
        type=int,
        default=0,
        help="if > 0, vacuum data files unreferenced by the newest N manifests",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("snapshot-compact")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from nifi_dicom_spark.lake.snapshot_table import SnapshotTable

    table = SnapshotTable.load(spark, args.table)
    before = table.manifest()
    buckets = (
        [int(b) for b in args.buckets.split(",")] if args.buckets else None
    )
    new_version = table.compact(buckets=buckets, min_deltas=args.min_deltas)
    removed = table.vacuum(args.vacuum_keep) if args.vacuum_keep > 0 else 0
    after = table.manifest()
    print(
        json.dumps(
            {
                "table": args.table,
                "compacted_version": new_version,
                "delta_files_before": sum(
                    len(v) for v in before.get("delta_files", {}).values()
                ),
                "delta_files_after": sum(
                    len(v) for v in after.get("delta_files", {}).values()
                ),
                "base_files_after": sum(len(v) for v in after["files"].values()),
                "vacuumed_files": removed,
            }
        )
    )


if __name__ == "__main__":
    main()
