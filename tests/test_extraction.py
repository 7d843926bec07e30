"""Span-sequence equality: Spark pipeline vs pure-Python golden extractor.

THE correctness gate (BASELINE.json north_rule): per document, the ordered
(kind, text, media_ref, order) sequence produced by the distributed pipeline
must equal the golden fixture exactly — including the pathological many-span
skew document.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medical_ocr_service_spark.operators import extract


@pytest.fixture(scope="module")
def loaded(spark, corpus_dir):
    docs = spark.read.parquet(f"{corpus_dir}/documents_interleaved.parquet")
    media = spark.read.parquet(f"{corpus_dir}/media.parquet")
    golden_spans = spark.read.parquet(f"{corpus_dir}/golden_spans.parquet")
    golden_fields = spark.read.parquet(f"{corpus_dir}/golden_fields.parquet")
    return docs, media, golden_spans, golden_fields


def test_span_sequence_equality_exploded(spark, loaded):
    """ordered_spans output == golden spans, row-for-row (full outer join empty diff)."""
    docs, media, golden_spans, _ = loaded
    ours = extract.ordered_spans(docs, media)

    g = golden_spans.select("doc_id", "order", "kind", "text", "media_ref")
    o = ours.select("doc_id", "order", "kind", "text", "media_ref")

    # exceptAll both directions — catches missing, extra, and differing rows
    diff1 = o.exceptAll(g).count()
    diff2 = g.exceptAll(o).count()
    assert diff1 == 0 and diff2 == 0, f"span mismatch: ours-extra={diff1} golden-extra={diff2}"
    assert o.count() == g.count() > 0


def test_span_sequence_equality_reassembled(spark, loaded):
    """Array-form reassembly matches golden per-doc ordered sequences exactly."""
    docs, media, golden_spans, _ = loaded
    ours = extract.reassembled_docs(docs, media).select("doc_id", "spans")

    g = (
        golden_spans.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("order", "kind", "text", "media_ref"))
            ).alias("_s")
        )
        .select(
            "doc_id",
            F.transform(
                "_s",
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["order"].alias("order"),
                ),
            ).alias("spans"),
        )
    )
    joined = ours.alias("o").join(g.alias("g"), "doc_id", "full")
    mismatch = joined.filter(
        F.col("o.spans").isNull()
        | F.col("g.spans").isNull()
        | (F.col("o.spans") != F.col("g.spans"))
    )
    bad = mismatch.count()
    if bad:
        r = mismatch.select("doc_id").first()
        raise AssertionError(f"{bad} docs mismatch, e.g. {r}")


def test_pathological_doc_order(spark, loaded):
    """The ~1000-span skew doc keeps dense 1..n ordering."""
    docs, media, _, _ = loaded
    ours = extract.ordered_spans(docs, media).filter(F.col("doc_id") == "doc00000211")
    rows = ours.select("order").orderBy("order").collect()
    orders = [r["order"] for r in rows]
    assert len(orders) > 900
    assert orders == list(range(1, len(orders) + 1))


def test_extracted_fields_match_golden(spark, loaded):
    """Field extraction (struct UDF) matches the golden per-doc fields."""
    docs, media, _, golden_fields = loaded
    ours = extract.extract_documents(docs, media).select(
        "doc_id",
        F.col("fields.ruc").alias("ruc"),
        F.col("fields.paciente_nombre").alias("paciente_nombre"),
        F.col("fields.paciente_ci").alias("paciente_ci"),
        F.col("fields.fecha_orden").alias("fecha_orden"),
        F.col("fields.diagnostico_texto").alias("diagnostico_texto"),
        F.col("fields.diagnostico_codigo_cie").alias("diagnostico_codigo_cie"),
        F.col("fields.medico_matricula").alias("medico_matricula"),
        F.col("fields.matricula_valida").alias("matricula_valida"),
        F.col("fields.urgente").alias("urgente"),
        F.col("fields.practicas_fuente").alias("practicas_fuente"),
        F.size("fields.practicas").alias("n_practicas"),
        F.col("fields.confianza_extraccion").alias("confianza_extraccion"),
        "requiere_revision",
    )
    g = golden_fields.select(
        "doc_id", "ruc", "paciente_nombre", "paciente_ci", "fecha_orden",
        "diagnostico_texto", "diagnostico_codigo_cie", "medico_matricula",
        "matricula_valida", "urgente", "practicas_fuente",
        F.col("n_practicas").cast("int").alias("n_practicas"),
        "confianza_extraccion", "requiere_revision",
    )
    d1 = ours.exceptAll(g).count()
    d2 = g.exceptAll(ours).count()
    assert d1 == 0 and d2 == 0, f"fields mismatch: ours-extra={d1} golden-extra={d2}"


def test_practica_items_match_golden(spark, loaded):
    """Per-practice (item, descripcion, cantidad, confianza) exploded equality."""
    docs, media, _, golden_fields = loaded
    ours = (
        extract.extract_documents(docs, media)
        .select("doc_id", F.explode("fields.practicas").alias("p"))
        .select("doc_id", "p.item", "p.descripcion", "p.cantidad", "p.confianza")
    )
    g = (
        golden_fields.select("doc_id", F.explode("practicas").alias("p"))
        .select(
            "doc_id",
            F.col("p.item").cast("int").alias("item"),
            "p.descripcion",
            F.col("p.cantidad").cast("int").alias("cantidad"),
            "p.confianza",
        )
    )
    assert ours.exceptAll(g).count() == 0
    assert g.exceptAll(ours).count() == 0


def test_salted_reassembly_equals_plain(spark, loaded):
    """Two-phase salted reassembly is bit-identical to the plain path,
    including on the ~1000-span skew doc."""
    docs, media, _, _ = loaded
    plain = extract.reassembled_docs(docs, media).select("doc_id", "spans", "full_text")
    salted = extract.reassembled_docs_salted(docs, media, n_salts=8).select(
        "doc_id", "spans", "full_text"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_extract_documents_salted_flag_equal(spark, loaded):
    """extract_documents(salted=True) — the path behind run_extraction
    --salted — yields the same rows as the default path."""
    docs, media, _, _ = loaded
    cols = ["doc_id", "spans", "full_text", "fields", "requiere_revision"]
    plain = extract.extract_documents(docs, media).select(cols)
    salted = extract.extract_documents(docs, media, salted=True).select(cols)
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


@pytest.mark.parametrize("strategy", ["broadcast", "denormalized"])
def test_media_strategies_equal_join(spark, loaded, strategy):
    """Every media_ref resolution strategy yields the identical span
    sequence (the denormalized path needs the v3 sidecar's owner keys)."""
    docs, media, _, _ = loaded
    cols = ["doc_id", "spans", "full_text"]
    join_mode = extract.reassembled_docs(docs, media, "join").select(cols)
    other = extract.reassembled_docs(docs, media, strategy).select(cols)
    assert join_mode.exceptAll(other).count() == 0
    assert other.exceptAll(join_mode).count() == 0


def test_denormalized_requires_owner_keys(spark, loaded):
    docs, media, _, _ = loaded
    with pytest.raises(ValueError, match="owner keys"):
        extract.clean_spans(
            docs, media.drop("doc_id", "offset"), "denormalized"
        )
