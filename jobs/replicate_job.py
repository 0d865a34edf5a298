#!/usr/bin/env python
"""spark-submit entrypoint for table→table CDC replication: tail a source
SnapshotTable's change feed (the ``snapshot_cdf`` streaming source) and
apply it to a replica with exactly-once semantics at both ends — the
continuous fan-out service of a lakehouse deployment (primary → read
replicas / downstream marts). See ``nifi_dicom_spark/streaming/replicate.py``
for the wiring and BENCH/STREAM.md for measured throughput.

Usage:
    spark-submit --py-files nifi_dicom_spark.zip jobs/replicate_job.py \
        --source /path/to/src_table --replica /path/to/replica \
        --checkpoint /path/to/ckpt [--starting-version N] \
        [--trigger "1 second"] [--timeout-s 0]

Creates the replica if absent. ``--timeout-s 0`` (default) runs until
terminated; a positive value stops the query after that many seconds and
prints one JSON line with the replica's row count and current version.
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True)
    ap.add_argument("--replica", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--starting-version", type=int, default=None)
    ap.add_argument("--trigger", default="1 second")
    ap.add_argument("--mode", default="cdf", choices=["cdf", "upserts"])
    ap.add_argument("--timeout-s", type=float, default=0.0)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("snapshot-replicate").getOrCreate()
    from nifi_dicom_spark.lake.snapshot_table import SnapshotTable
    from nifi_dicom_spark.streaming.replicate import (
        create_replica_table,
        replicate_stream,
    )

    src = SnapshotTable.load(spark, args.source)
    starting = args.starting_version
    if os.path.isdir(os.path.join(args.replica, "meta")):
        replica = SnapshotTable.load(spark, args.replica)
    else:
        replica = create_replica_table(spark, args.replica, src)
        if starting is None:
            # a FRESH replica must start from the beginning — the source
            # default (current version) would silently omit every row
            # committed before this job started
            starting = 0

    q = replicate_stream(
        spark,
        args.source,
        replica,
        args.checkpoint,
        starting_version=starting,
        trigger_interval=args.trigger,
        mode=args.mode,
    )
    if args.timeout_s > 0:
        q.awaitTermination(args.timeout_s)
        q.stop()
        from nifi_dicom_spark.operators.apply import read_final_state

        print(
            json.dumps(
                {
                    "replica_rows": read_final_state(replica).count(),
                    "replica_version": replica.current_version(),
                    "source_version": src.current_version(),
                }
            )
        )
    else:
        q.awaitTermination()


if __name__ == "__main__":
    main()
