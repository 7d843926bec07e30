"""spark-submit entry point for the corpus-curation funnel
(plans/curation.curate_corpus): quality -> language -> repetition -> PII
scrub -> exact dedup -> near-dup removal -> optional decontamination ->
deterministic split, with the per-stage funnel counters printed as one
JSON line.

Cluster usage (same submission contract as run_extraction):

    python jobs/package.py                      # builds dist/medical_ocr_service_spark.zip
    spark-submit \
        --master <cluster> \
        --py-files dist/medical_ocr_service_spark.zip \
        jobs/run_curation.py \
        --docs s3://bucket/documents/ \
        --output s3://bucket/curated/ \
        [--bench s3://bucket/benchmarks/] [--shuffle-partitions N]

Local smoke:

    spark-submit --master 'local[8]' \
        --py-files dist/medical_ocr_service_spark.zip \
        jobs/run_curation.py --docs ... --output /tmp/curated
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="parquet dir/file of documents")
    ap.add_argument("--output", required=True, help="output parquet root")
    ap.add_argument("--bench", default=None, help="optional benchmark parquet for decontamination")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-dup-word-fraction", type=float, default=0.5)
    ap.add_argument("--jaccard-threshold", type=float, default=0.8)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("corpus-curation")
    if args.shuffle_partitions:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    from medical_ocr_service_spark.plans.curation import (
        curate_corpus,
        curation_report,
    )

    docs = spark.read.parquet(args.docs)
    bench = spark.read.parquet(args.bench) if args.bench else None
    curated, obs = curate_corpus(
        docs,
        text_col=args.text_col,
        id_col=args.id_col,
        bench=bench,
        min_quality=args.min_quality,
        min_tokens=args.min_tokens,
        max_dup_word_fraction=args.max_dup_word_fraction,
        jaccard_threshold=args.jaccard_threshold,
    )
    # the write is the action that populates rows_final; split label
    # partitions the output so downstream readers prune by split
    curated.write.mode("overwrite").partitionBy("split").parquet(args.output)
    print(json.dumps(curation_report(obs)))
    spark.stop()


if __name__ == "__main__":
    main()
