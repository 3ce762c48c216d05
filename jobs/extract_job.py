"""Production extraction job — spark-submit entry point.

Usage (cluster):
    python jobs/package.py   # builds dist/ksoup_spark.zip
    spark-submit --py-files dist/ksoup_spark.zip \
        jobs/extract_job.py \
        --input  <path or iceberg table of (doc_id, spans)> \
        --output <spans path> --metrics <metrics path> \
        [--num-parts 4096] [--parts-per-batch 64]

Reads the interleaved corpus, runs the span-extraction kernel with salted
partitioning, writes spans + per-partition lineage metrics, and resumes
from the metrics table if rerun (north-rule checkpoint contract).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main(argv: list[str]) -> None:
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--input",
                   help="path or iceberg table of (doc_id, spans)")
    g.add_argument("--synth-sf-dir",
                   help="testdata sf dir: build the deterministic "
                        "interleaved corpus in-memory (sandbox runs)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--metrics", required=True)
    ap.add_argument("--num-parts", type=int, default=256)
    ap.add_argument("--parts-per-batch", type=int, default=16)
    # default tracks ksoup_spark.session.DEFAULT_ARROW_BATCH (the measured
    # IPC-framing knee); imported lazily below to keep --help py-files-free
    ap.add_argument("--arrow-batch", type=int, default=None)
    args = ap.parse_args(argv)

    if args.arrow_batch is None:
        from ksoup_spark.session import DEFAULT_ARROW_BATCH

        args.arrow_batch = DEFAULT_ARROW_BATCH
    spark = (
        SparkSession.builder.appName("ksoup-extract")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(args.arrow_batch))
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    from ksoup_spark.plans.pipeline import run_extraction_pipeline

    if args.synth_sf_dir:
        from ksoup_spark.sources.corpus import build_docs_table

        docs = build_docs_table(spark, args.synth_sf_dir)
    else:
        docs = (
            spark.read.format("iceberg").load(args.input)
            if not args.input.startswith(("/", "file:", "s3:", "hdfs:"))
            and "." in args.input
            else spark.read.parquet(args.input)
        )
    summary = run_extraction_pipeline(
        spark, docs, args.output, args.metrics,
        num_parts=args.num_parts, parts_per_batch=args.parts_per_batch,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
