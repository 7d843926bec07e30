"""Streaming extraction: continuous ingestion of interleaved-doc files.

The reference runs a durable work queue with crash recovery
(/root/reference/src/services/job-queue.service.js) — the Structured
Streaming equivalent is a file-source stream with checkpointed offsets:
new parquet files of documents are discovered, each micro-batch runs the
same deterministic extraction DAG via foreachBatch, and the checkpoint
directory gives exactly-once recovery (Q1-Q4 semantics: enqueue = file
landing, retry/backoff = task retries, crash recovery = offset replay).

Also provided: windowed_event_counts — event-time tumbling windows with a
watermark (the streaming analogue of the reference's hourly metrics rollup,
src/utils/metrics.js:47-58).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def stream_extraction(
    spark: SparkSession,
    docs_dir: str,
    media: DataFrame,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """File-source stream -> foreachBatch(extract_documents) -> parquet append.

    foreachBatch (not a stateful streaming agg) because span reassembly is a
    per-document batch-local operation: every file contains whole documents,
    so no cross-batch state or watermark is needed — the idiomatic pattern for
    'queue of self-contained work items'."""
    from ..operators import extract

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(docs_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        result = extract.extract_documents(batch_df, media)
        (
            result.select(
                "doc_id",
                F.col("spans").cast("string").alias("spans_json"),
                "full_text",
                "fields.*",
                "requiere_revision",
                F.lit(batch_id).alias("batch_id"),
            )
            .write.mode("append")
            .parquet(output_path)
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts with late-data watermark (A8 analogue)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
