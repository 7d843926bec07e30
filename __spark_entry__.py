"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline; ``queries()`` /
``oracle_sql()`` expose the relational/analytics operators over the driver's
testdata parquet for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DEFAULT = "/root/testdata/sf0.001"


def _interleaved_corpus(spark: SparkSession, n_docs: int = 300) -> tuple[DataFrame, DataFrame]:
    """Deterministically synthesized interleaved text+media docs table
    (BASELINE.json input_hint shape; seed-fixed, no external data)."""
    from medical_ocr_service_spark.corpus import generator

    docs, media = generator.synthesize_corpus(n_docs)
    doc_rows = [
        (
            d["doc_id"],
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]],
        )
        for d in docs
    ]
    docs_df = spark.createDataFrame(
        doc_rows,
        schema="doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    media_df = spark.createDataFrame(
        [(m["media_ref"], m["layout_json"], m["width"], m["height"]) for m in media],
        schema="media_ref string, layout_json string, width int, height int",
    )
    return docs_df, media_df


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end extraction over the interleaved corpus —
    boilerplate strip + XY-cut + span reassembly + field extraction —
    returning one row per document with structured fields (smoke: rows>0,
    stable schema). Also touches /root/testdata/sf0.001 to validate reads."""
    from medical_ocr_service_spark.operators import extract

    # smoke-read the driver testdata (flagship inputs live in queries())
    spark.read.parquet(f"{SF_DEFAULT}/documents.parquet").limit(1).collect()

    docs_df, media_df = _interleaved_corpus(spark)
    result = extract.extract_documents(docs_df, media_df)
    return result.select(
        "doc_id",
        F.col("fields.paciente_nombre").alias("paciente_nombre"),
        F.col("fields.paciente_ci").alias("paciente_ci"),
        F.col("fields.fecha_orden").alias("fecha_orden"),
        F.col("fields.diagnostico_codigo_cie").alias("diagnostico_codigo_cie"),
        F.col("fields.medico_matricula").alias("medico_matricula"),
        F.col("fields.urgente").alias("urgente"),
        F.size("fields.practicas").alias("n_practicas"),
        F.col("fields.confianza_extraccion").alias("confianza_extraccion"),
        "requiere_revision",
        F.size("spans").alias("n_spans"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (grows per round)."""
    from medical_ocr_service_spark.plans import entry_queries

    return entry_queries.QUERIES


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each queries() key (same column names)."""
    from medical_ocr_service_spark.plans import entry_queries

    return entry_queries.ORACLES
