"""Feedback state machine, corrections, training dataset, outbox (§3.3)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from medical_ocr_service_spark.plans import feedback as fb


@pytest.fixture(scope="module")
def header(spark):
    rows = [
        ("d1", "PENDIENTE", 0.9, False, 2, "Ana", "123", "55555", "K29.5"),
        ("d2", "PENDIENTE", 0.7, True, 1, "Luis", "456", "44444", "I10"),
        ("d3", "APROBADA", 0.95, False, 3, "Eva", "789", "33333", "E11.9"),
        ("d4", "PENDIENTE", 0.8, True, 1, "Juan", "321", "22222", "M54.5"),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, estado string, confianza_general double, "
        "requiere_revision boolean, n_practicas int, paciente_nombre string, "
        "paciente_ci string, medico_matricula string, diagnostico_codigo_cie string",
    )


def test_guarded_state_transitions(spark, header):
    fdbk = spark.createDataFrame(
        [("d1", "APROBAR", None), ("d2", "RECHAZAR", "ilegible"),
         ("d3", "RECHAZAR", "ya aprobada"), ("dX", "APROBAR", None)],
        "doc_id string, accion string, motivo string",
    )
    out = fb.apply_feedback(header, fdbk).toPandas().set_index("doc_id")
    assert out.loc["d1", "estado"] == "APROBADA"
    assert out.loc["d2", "estado"] == "RECHAZADA"
    assert out.loc["d2", "motivo_rechazo"] == "ilegible"
    # guard: d3 was already APROBADA -> RECHAZAR is a no-op
    assert out.loc["d3", "estado"] == "APROBADA"
    assert out.loc["d4", "estado"] == "PENDIENTE"


def test_corrections_and_feedback_rows(spark):
    detail = spark.createDataFrame(
        [("d1", 1, "HEMOGRAMA", 5, 0.92), ("d1", 2, "GLUCEMIA", 7, 0.88),
         ("d2", 1, "RX TORAX", 9, 0.75)],
        "doc_id string, item int, descripcion_original string, "
        "nomenclador_id_sugerido int, similitud double",
    )
    corr = spark.createDataFrame(
        [("d1", 2, 11, "era perfil lipidico")],
        "doc_id string, item int, nomenclador_id_corregido int, comentario string",
    )
    out = fb.apply_corrections(detail, corr).toPandas()
    by = out.set_index(["doc_id", "item"])
    assert by.loc[("d1", 2), "estado_item"] == "CORREGIDO"
    assert by.loc[("d1", 2), "nomenclador_id_corregido"] == 11
    assert by.loc[("d1", 1), "estado_item"] == "SUGERIDO"

    rows = fb.feedback_matching_rows(
        fb.apply_corrections(detail, corr)
    ).toPandas()
    assert len(rows) == 1
    assert rows.iloc[0]["id_sugerido"] == 7 and rows.iloc[0]["id_correcto"] == 11
    assert rows.iloc[0]["tipo"] == "nomenclador"


def test_training_dataset_antijoin(spark, header):
    fdbk = spark.createDataFrame(
        [("d1", "APROBAR", None), ("d2", "APROBAR", None)],
        "doc_id string, accion string, motivo string",
    )
    validated = fb.apply_feedback(header, fdbk)
    ds_all = fb.build_training_dataset(validated, None).toPandas()
    # d1, d2 newly approved + d3 already approved (validado_en null -> orderBy
    # puts it last but it IS included)
    assert set(ds_all["doc_id"]) == {"d1", "d2", "d3"}
    rec = json.loads(ds_all.iloc[0]["jsonl"])
    assert [m["role"] for m in rec["messages"]] == ["user", "assistant"]

    # a finetune job completed in the future consumes everything
    jobs = spark.createDataFrame(
        [("SUCCEEDED", "2099-01-01 00:00:00")],
        "estado string, completado_en string",
    ).withColumn("completado_en", F.col("completado_en").cast("timestamp"))
    ds_after = fb.build_training_dataset(validated, jobs).toPandas()
    # d3 has NULL validado_en -> non-equi condition unknown -> kept by anti-join
    assert set(ds_after["doc_id"]) == {"d3"}


def test_webhook_outbox(spark, header):
    out = fb.webhook_outbox(header).toPandas().set_index("doc_id")
    assert out.loc["d1", "evento"] == "previsacion.generada"
    assert out.loc["d3", "evento"] == "previsacion.aprobada"
    assert out["firma"].str.len().eq(64).all()
    assert out.loc["d1", "retry_schedule_s"].tolist() == [5, 15, 30, 60, 120]
    p = json.loads(out.loc["d2", "payload"])
    assert p["doc_id"] == "d2" and p["requiere_revision"] is True
    # signature is REAL RFC-2104 HMAC-SHA256, verified against the stdlib
    import hashlib
    import hmac as _hmac

    for doc in out.index:
        expected = _hmac.new(
            b"whsec_demo", out.loc[doc, "payload"].encode(), hashlib.sha256
        ).hexdigest()
        assert out.loc[doc, "firma"] == expected


def test_hmac_sha256_long_key(spark):
    """Keys >64 bytes are pre-hashed per RFC 2104."""
    import hashlib
    import hmac as _hmac

    from medical_ocr_service_spark.functions.text import hmac_sha256

    secret = "k" * 100
    df = spark.createDataFrame([("hello world",)], "m string")
    got = df.select(hmac_sha256(F.col("m"), secret).alias("h")).first()["h"]
    assert got == _hmac.new(secret.encode(), b"hello world", hashlib.sha256).hexdigest()


def test_dot_path_corrections(spark):
    """F20: nested dot-path corrections via withField; original preserved;
    untouched docs and sibling fields unchanged; bad paths rejected."""
    df = spark.createDataFrame(
        [("d1", (("ana", 1), 5)), ("d2", (("luis", 2), 6))],
        "doc_id string, fields struct<inner:struct<name:string,qty:int>, other:int>",
    )
    corr = spark.createDataFrame(
        [("d1", "inner.qty", "7"), ("d1", "inner.name", "ana maria")],
        "doc_id string, path string, value string",
    )
    out = fb.apply_dot_path_corrections(df, corr).toPandas().set_index("doc_id")
    d1 = out.loc["d1", "fields"]
    assert d1["inner"]["qty"] == 7 and d1["inner"]["name"] == "ana maria"
    assert d1["other"] == 5  # sibling untouched
    orig = out.loc["d1", "fields_original"]
    assert orig["inner"]["qty"] == 1 and orig["inner"]["name"] == "ana"
    d2 = out.loc["d2", "fields"]
    assert d2["inner"]["qty"] == 2 and d2["inner"]["name"] == "luis"

    import pytest as _pytest

    bad = spark.createDataFrame(
        [("d1", "other.nope", "1")], "doc_id string, path string, value string"
    )
    with _pytest.raises(ValueError, match="not inside a struct"):
        fb.apply_dot_path_corrections(df, bad)


def test_precision_metrics(spark, header):
    """metricas_precision analogue: per-field precision over validated docs."""
    fdbk = spark.createDataFrame(
        [("d1", "APROBAR", None), ("d2", "RECHAZAR", "mala"), ("d4", "APROBAR", None)],
        "doc_id string, accion string, motivo string",
    )
    validated = fb.apply_feedback(header, fdbk)  # d1,d2,d4 newly + d3 already
    corr = spark.createDataFrame(
        [("d1", "paciente_ci", "111", "222"),
         ("d1", "paciente_ci", "111", "333"),  # dup (doc,campo) collapses
         ("d2", "medico_matricula", "44444", "55555"),
         ("d2", "campo_desconocido", "x", "y")],  # outside tracked fields
        "doc_id string, campo string, valor_original string, valor_corregido string",
    )
    out = fb.precision_metrics(validated, corr).toPandas().set_index("campo")
    assert set(out.index) == set(fb.PRECISION_FIELDS)
    assert (out["n_validados"] == 4).all()  # d1,d2,d3,d4
    assert out.loc["paciente_ci", "n_corregidos"] == 1
    assert out.loc["paciente_ci", "precision"] == 0.75
    assert out.loc["medico_matricula", "precision"] == 0.75
    assert out.loc["practicas", "n_corregidos"] == 0
    assert out.loc["practicas", "precision"] == 1.0


def test_should_trigger_training(spark):
    """Q7: >= threshold unconsumed examples AND >= min interval elapsed."""
    ex = spark.range(60).selectExpr("CAST(id AS STRING) AS doc_id")
    now = 1_700_000_000.0
    fire, n = fb.should_trigger_training(ex, threshold=50, now_ts=now)
    assert fire and n == 60
    # below threshold -> no
    fire, n = fb.should_trigger_training(ex.limit(10), threshold=50, now_ts=now)
    assert not fire and n == 10
    # ran 1h ago -> too soon
    fire, _ = fb.should_trigger_training(
        ex, threshold=50, last_run_ts=now - 3600, now_ts=now
    )
    assert not fire
    # ran 25h ago -> due again
    fire, _ = fb.should_trigger_training(
        ex, threshold=50, last_run_ts=now - 25 * 3600, now_ts=now
    )
    assert fire


def test_tenant_ownership_guard(spark):
    """Reference feedback.routes.js:63-69: feedback on a doc the tenant
    doesn't own must mutate NOTHING and land in the error output."""
    header = spark.createDataFrame(
        [("d1", "PENDIENTE", "tenant-a"), ("d2", "PENDIENTE", "tenant-b")],
        "doc_id string, estado string, tenant_id string",
    )
    fdbk = spark.createDataFrame(
        [
            ("d1", "APROBAR", None, "tenant-a"),   # owned -> fires
            ("d2", "APROBAR", None, "tenant-a"),   # cross-tenant -> rejected
            ("dX", "RECHAZAR", "x", "tenant-a"),   # unknown doc -> rejected
        ],
        "doc_id string, accion string, motivo string, tenant_id string",
    )
    valid, errors = fb.validate_feedback_tenant(header, fdbk)
    err = errors.toPandas().set_index("doc_id")
    assert set(err.index) == {"d2", "dX"}
    assert err.loc["d2", "error"] == "tenant no es dueño del documento"
    assert err.loc["dX", "error"] == "documento no encontrado"
    out = fb.apply_feedback(header, valid).toPandas().set_index("doc_id")
    assert out.loc["d1", "estado"] == "APROBADA"
    assert out.loc["d2", "estado"] == "PENDIENTE"  # untouched


def test_tenant_guard_defense_in_depth(spark):
    """Even WITHOUT the route-level gate, apply_feedback itself refuses a
    cross-tenant transition when both sides carry tenant_id."""
    header = spark.createDataFrame(
        [("d1", "PENDIENTE", "tenant-a")],
        "doc_id string, estado string, tenant_id string",
    )
    cross = spark.createDataFrame(
        [("d1", "APROBAR", None, "tenant-b")],
        "doc_id string, accion string, motivo string, tenant_id string",
    )
    out = fb.apply_feedback(header, cross).toPandas()
    assert out.loc[0, "estado"] == "PENDIENTE"
    assert "_fb_tenant" not in out.columns
    # corrections: cross-tenant correction never attaches
    detail = spark.createDataFrame(
        [("d1", 1, "HEMOGRAMA", 5, 0.92, "tenant-a")],
        "doc_id string, item int, descripcion_original string, "
        "nomenclador_id_sugerido int, similitud double, tenant_id string",
    )
    corr = spark.createDataFrame(
        [("d1", 1, 11, "x", "tenant-b")],
        "doc_id string, item int, nomenclador_id_corregido int, "
        "comentario string, tenant_id string",
    )
    cout = fb.apply_corrections(detail, corr).toPandas()
    assert cout.loc[0, "estado_item"] == "SUGERIDO"
