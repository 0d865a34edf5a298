#!/usr/bin/env python
"""spark-submit entrypoint for the end-to-end training-corpus pipeline:
raw documents → exact dedup → near-dup cluster prune → quality filter →
PII redaction → benchmark decontamination → mixture weighting → global
deterministic shuffle → token-budget shard packing → packed shard files.

One command takes the corpus from "scraped documents" to "training
shards", composing the operator family the engine already ships
(functions/dedup_text, text, pii, corpus; operators/merge_context) in the
order a production pipeline runs them. Every stage is deterministic — a
pure function of (input bytes, flags) — so re-runs, partial re-runs, and
two cluster sizes produce byte-identical shard assignments; the whole job
is idempotent by construction (same reason the CDC side can replay: no
rand(), no wall-clock, md5-keyed sampling and ordering throughout).

Scale shape per stage (each is the shape documented on its operator):
exact dedup = one hash aggregate; near-dup = banded LSH with bucket caps
(never all-pairs) + adaptive connected components; quality/PII = narrow
zero-shuffle projections; decontamination broadcasts the heldout side;
mixture sampling is an md5 filter + bounded explode; the global shuffle
and shard packing are two-phase distributed prefix scans (range partition
→ per-partition window → O(partitions) offset fold). The only driver-side
materializations are O(partitions) offsets, O(pairs) sub-threshold
union-find edges, and the O(sources) mixture-rate table.

Usage:
    spark-submit --py-files nifi_dicom_spark.zip jobs/corpus_job.py \
        --input /data/documents.parquet --output /data/shards \
        [--heldout /data/eval.parquet] \
        [--weights src0=3,src1=1,src2=0.5] [--token-budget 6000] \
        [--shard-tokens 100000] [--near-dup-threshold 0.7] \
        [--min-tokens 10] [--salt r4]

Prints one JSON line of per-stage survivor counts and output totals.

Reference analog: the reference chains its processors into one NiFi flow
(deidentify → route → batch per destination); this is the same
flow-composition idea over the corpus operators, as one declarative plan
per stage instead of per-file flowfile hops.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _parse_weights(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if not k or not v:
            raise ValueError(f"bad --weights entry {part!r} (want name=weight)")
        out[k.strip()] = float(v)
    return out


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    heldout_path: str | None = None,
    weights: dict[str, float] | None = None,
    token_budget: int = 6_000,
    shard_tokens: int = 100_000,
    near_dup_threshold: float = 0.7,
    min_tokens: int = 10,
    salt: str = "r4",
) -> dict:
    """Run the full corpus pipeline; returns the per-stage metrics dict.

    Factored out of main() so tests drive it with their own session.
    """
    from nifi_dicom_spark.functions.corpus import (
        corpus_shuffle,
        decontaminate,
        mixture_plan,
        mixture_sample,
        pack_shards,
    )
    from nifi_dicom_spark.functions.dedup_text import exact_dedup, near_dup_pairs
    from nifi_dicom_spark.functions.pii import redact
    from nifi_dicom_spark.functions.text import quality_filter, token_count
    from nifi_dicom_spark.operators.merge_context import connected_groups

    n_par = spark.sparkContext.defaultParallelism
    docs = (
        spark.read.parquet(input_path)
        .select("doc_id", "source", "text")
        .repartition(n_par)  # single-file inputs otherwise run 1 task
        .persist()
    )
    metrics: dict = {"input_docs": docs.count()}

    # 1. exact dedup — keep the lowest-id representative per fingerprint
    exact_keep = exact_dedup(docs, "text", "doc_id").select("doc_id")
    docs1 = docs.join(exact_keep, "doc_id", "left_semi").persist()
    metrics["after_exact_dedup"] = docs1.count()
    docs.unpersist()

    # 2. near-dup clusters — keep each cluster's min-id canonical doc
    pairs = near_dup_pairs(
        docs1, "text", "doc_id", threshold=near_dup_threshold
    )
    comp = connected_groups(pairs, "id_a", "id_b")
    drop = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    docs2 = docs1.join(drop, "doc_id", "left_anti").persist()
    metrics["after_near_dup"] = docs2.count()
    docs1.unpersist()

    # 3. PII redaction BEFORE the quality gate: redacted docs should
    # survive (placeholders carry no PII), not be dropped by the
    # has_pii rule — redact-then-filter is the order that keeps them
    redacted = docs2.withColumn("text", redact(F.col("text")))
    # 4. quality filter (keep decision with machine-readable reasons)
    qf = quality_filter(redacted, "text", "doc_id", min_tokens=min_tokens)
    keep_ids = qf.filter(F.col("keep")).select("doc_id")
    docs3 = redacted.join(keep_ids, "doc_id", "left_semi").persist()
    metrics["after_quality_filter"] = docs3.count()
    docs2.unpersist()

    # 5. benchmark decontamination (optional) — heldout side broadcasts
    if heldout_path:
        heldout = spark.read.parquet(heldout_path).select("doc_id", "text")
        contaminated = decontaminate(docs3, heldout, "text", "doc_id").select(
            F.col("id").alias("doc_id")
        )
        docs4 = docs3.join(contaminated, "doc_id", "left_anti").persist()
        metrics["after_decontaminate"] = docs4.count()
        docs3.unpersist()
    else:
        docs4 = docs3
        metrics["after_decontaminate"] = metrics["after_quality_filter"]

    # 6. mixture weighting: derive per-source rates, apply deterministically
    if weights:
        plan_rows = mixture_plan(
            docs4, weights=weights, token_budget=token_budget
        ).collect()  # O(sources)
        rates = {r["source"]: r["sample_rate"] for r in plan_rows}
        sampled = mixture_sample(docs4, rates=rates, salt=salt)
        metrics["mixture_rates"] = {k: round(v, 6) for k, v in rates.items()}
    else:
        sampled = docs4.withColumn("_copy", F.lit(1)).withColumn(
            "_u", F.lit(0.0)
        )
    # upsampled copies share doc_id — the shuffle/packing key must be unique
    sampled = sampled.withColumn(
        "sample_id",
        F.concat_ws("#", F.col("doc_id").cast("string"), F.col("_copy")),
    ).persist()
    metrics["sampled_docs"] = sampled.count()
    docs4.unpersist()

    # 7. deterministic global shuffle → 8. token-budget shard packing
    order = corpus_shuffle(sampled, id_col="sample_id", salt=salt).select(
        F.col("id").alias("sample_id"), "position"
    )
    ordered = sampled.join(order, "sample_id").withColumn(
        "n_tokens", token_count("text")
    )
    packed = pack_shards(
        ordered, "position", "n_tokens", target_weight=shard_tokens
    ).select(
        F.col("id").alias("position"),
        F.col("weight").alias("n_tokens"),
        "cum_weight",
        "shard_id",
    )
    out = ordered.drop("n_tokens").join(packed, "position").select(
        "shard_id",
        "position",
        "doc_id",
        "source",
        "_copy",
        "n_tokens",
        "text",
    )
    # range-partition by position: shard files are contiguous position
    # runs (a shard never spans more partitions than its size requires)
    # without the dynamic-partition writer, which anti-scales with threads
    (
        out.repartitionByRange(n_par, "position")
        .sortWithinPartitions("position")
        .write.mode("overwrite")
        .parquet(output_path)
    )
    sampled.unpersist()

    written = spark.read.parquet(output_path)
    metrics["output_docs"] = written.count()
    agg = written.groupBy().agg(
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("shard_id").alias("shards"),
    ).collect()[0]
    metrics["output_tokens"] = agg["tokens"]
    metrics["output_shards"] = agg["shards"]
    metrics["output_path"] = output_path
    return metrics


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--heldout", default=None)
    ap.add_argument("--weights", default=None, help="name=weight,name=weight")
    ap.add_argument("--token-budget", type=int, default=6_000)
    ap.add_argument("--shard-tokens", type=int, default=100_000)
    ap.add_argument("--near-dup-threshold", type=float, default=0.7)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--salt", default="r4")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("corpus-pipeline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    metrics = run_pipeline(
        spark,
        input_path=args.input,
        output_path=args.output,
        heldout_path=args.heldout,
        weights=_parse_weights(args.weights) if args.weights else None,
        token_budget=args.token_budget,
        shard_tokens=args.shard_tokens,
        near_dup_threshold=args.near_dup_threshold,
        min_tokens=args.min_tokens,
        salt=args.salt,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
