"""Feedback loop: approve/reject/correct + training-dataset build + outbox.

Re-expresses the reference's POST /ordenes/:id/feedback flow (SURVEY §3.3,
/root/reference/src/routes/v1/feedback.routes.js:26-174) and the auto-training
dataset builder (src/services/auto-training.service.js:153-358) as batch
DataFrame transforms:

  * apply_feedback        — guarded state transitions PENDIENTE->APROBADA /
    RECHAZADA (pre-visacion.service.js:420-483) and per-item corrections
    (:485-547) via dot-path-free struct updates;
  * feedback_matching_rows — the per-correction feedback fact table;
  * build_training_dataset — J11 non-equi anti-join (orders not yet covered
    by a succeeded finetune job) + S11 JSONL message shaping;
  * webhook_outbox        — S12 as a table: payload JSON + HMAC-style
    signature column + retry schedule; network delivery is out of scope, the
    dead-letter shape is the `webhook_failures` analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_ACTIONS = ("APROBAR", "RECHAZAR", "CORREGIR")
RETRY_SCHEDULE_S = [5, 15, 30, 60, 120]  # webhook.service.js:99-101


def validate_feedback_tenant(
    header: DataFrame, feedback: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Tenant-ownership gate (reference feedback.routes.js:63-69: the route
    re-reads the order `WHERE id=$1 AND tenant_id=$2` and 404s on a miss
    BEFORE any mutation). Returns (valid_feedback, errors): feedback rows
    naming a doc the tenant doesn't own — or no doc at all — are routed to
    the error side untouched; only owned rows proceed to apply_feedback /
    apply_corrections. Both inputs must carry tenant_id."""
    owner = header.select(
        F.col("doc_id").alias("_h_doc"), F.col("tenant_id").alias("_h_tenant")
    )
    j = feedback.join(owner, feedback.doc_id == owner._h_doc, "left")
    ok = F.col("_h_doc").isNotNull() & (F.col("tenant_id") == F.col("_h_tenant"))
    valid = j.filter(ok).select(*feedback.columns)
    errors = j.filter(~F.coalesce(ok, F.lit(False))).select(
        *feedback.columns,
        F.when(F.col("_h_doc").isNull(), "documento no encontrado")
        .otherwise("tenant no es dueño del documento")
        .alias("error"),
    )
    return valid, errors


def apply_feedback(header: DataFrame, feedback: DataFrame) -> DataFrame:
    """Guarded state machine on the header table.

    feedback: (doc_id, accion, motivo). Transitions only fire from PENDIENTE —
    a second APROBAR/RECHAZAR on the same doc is a no-op, mirroring the
    reference's `WHERE estado = 'PENDIENTE'` guard. When BOTH sides carry a
    tenant_id column, the transition additionally requires tenant ownership
    (defense-in-depth below validate_feedback_tenant — cross-tenant feedback
    can never mutate even if a caller skips the route-level gate)."""
    check_tenant = "tenant_id" in header.columns and "tenant_id" in feedback.columns
    fb_cols = [
        F.col("doc_id").alias("_fb_doc"),
        F.col("accion").alias("_accion"),
        F.col("motivo").alias("_motivo"),
    ]
    if check_tenant:
        fb_cols.append(F.col("tenant_id").alias("_fb_tenant"))
    fb = (
        feedback.filter(F.col("accion").isin(*VALID_ACTIONS))
        .dropDuplicates(["doc_id"])
        .select(*fb_cols)
    )
    # capture the guard BEFORE the estado column is rewritten — later
    # withColumns would otherwise see the post-transition state
    joined = header.join(
        F.broadcast(fb), header.doc_id == fb._fb_doc, "left"
    ).withColumn("_was_pendiente", F.col("estado") == "PENDIENTE")
    guarded = F.col("_was_pendiente")
    if check_tenant:
        guarded = guarded & (F.col("_fb_tenant") == header.tenant_id)
    return (
        joined.withColumn(
            "estado",
            F.when(guarded & (F.col("_accion") == "APROBAR"), "APROBADA")
            .when(guarded & (F.col("_accion") == "RECHAZAR"), "RECHAZADA")
            .otherwise(F.col("estado")),
        )
        .withColumn(
            "motivo_rechazo",
            F.when(guarded & (F.col("_accion") == "RECHAZAR"), F.col("_motivo")),
        )
        .withColumn(
            "validado_en",
            F.when(
                guarded & F.col("_accion").isin("APROBAR", "RECHAZAR"),
                F.current_timestamp(),
            ),
        )
        .drop("_fb_doc", "_accion", "_motivo", "_was_pendiente", "_fb_tenant")
    )


def apply_corrections(detail: DataFrame, corrections: DataFrame) -> DataFrame:
    """Per-item corrections (CORREGIR): corrections(doc_id, item,
    nomenclador_id_corregido, comentario) -> detail with corrected columns +
    estado_item, original suggestion preserved."""
    check_tenant = "tenant_id" in detail.columns and "tenant_id" in corrections.columns
    c_cols = [
        F.col("doc_id").alias("_c_doc"),
        F.col("item").alias("_c_item"),
        F.col("nomenclador_id_corregido"),
        F.col("comentario").alias("correccion_comentario"),
    ]
    if check_tenant:
        c_cols.append(F.col("tenant_id").alias("_c_tenant"))
    c = corrections.select(*c_cols)
    cond = (detail.doc_id == c._c_doc) & (detail.item == c._c_item)
    if check_tenant:
        # same ownership defense as apply_feedback: a cross-tenant correction
        # never attaches, so estado_item stays SUGERIDO
        cond = cond & (detail.tenant_id == c._c_tenant)
    joined = detail.join(F.broadcast(c), cond, "left")
    if check_tenant:
        joined = joined.drop("_c_tenant")
    return joined.withColumn(
        "estado_item",
        F.when(F.col("nomenclador_id_corregido").isNotNull(), "CORREGIDO").otherwise(
            "SUGERIDO"
        ),
    ).drop("_c_doc", "_c_item")


def _field_type(struct_type, path: str):
    from pyspark.sql import types as T

    t = struct_type
    for part in path.split("."):
        if not isinstance(t, T.StructType):
            raise ValueError(f"path {path!r}: {part!r} is not inside a struct")
        t = t[part].dataType
    return t


def apply_dot_path_corrections(
    results: DataFrame, corrections: DataFrame, struct_col: str = "fields"
) -> DataFrame:
    """F20 (reference src/services/feedback.service.js:306-336): apply
    corrections addressed by dot paths ('a.b.c') into the nested result
    struct — Spark-native via Column.withField, which accepts dotted paths.

    corrections: (doc_id, path, value[string]). Values are cast to the
    target field's type (resolved by walking the struct schema). The
    pre-correction struct is preserved in ``fields_original``. Paths into
    array elements are out of scope here — per-item corrections go through
    apply_corrections (item-keyed), matching the reference's split between
    header-field and detail-item corrections.

    Scale: the correction set pivots to one column per DISTINCT path and
    broadcast-joins on doc_id — the fact table never shuffles.
    """
    paths = sorted(r["path"] for r in corrections.select("path").distinct().collect())
    schema = results.schema[struct_col].dataType
    types = {p: _field_type(schema, p) for p in paths}  # validate all up front
    pivot = corrections.groupBy("doc_id").pivot("path", paths).agg(F.first("value"))
    safe = {p: f"_corr_{i}" for i, p in enumerate(paths)}
    for p, s in safe.items():
        pivot = pivot.withColumnRenamed(p, s)
    out = results.withColumn("fields_original", F.col(struct_col)).join(
        F.broadcast(pivot), "doc_id", "left"
    )
    updated = F.col(struct_col)
    for p in paths:
        corr = F.col(safe[p]).cast(types[p])
        updated = updated.withField(p, F.coalesce(corr, F.col(f"{struct_col}.{p}")))
    return out.withColumn(struct_col, updated).drop(*safe.values())


def feedback_matching_rows(detail_corrected: DataFrame) -> DataFrame:
    """feedback_matching fact rows: one per corrected item, carrying the
    (wrong suggestion, right answer) pair the matcher learns from
    (feedback.routes.js:104-154)."""
    return detail_corrected.filter(F.col("estado_item") == "CORREGIDO").select(
        "doc_id",
        "item",
        F.col("descripcion_original").alias("texto_consulta"),
        F.col("nomenclador_id_sugerido").alias("id_sugerido"),
        F.col("nomenclador_id_corregido").alias("id_correcto"),
        F.col("similitud").alias("similitud_sugerida"),
        F.lit("nomenclador").alias("tipo"),
    )


def build_training_dataset(
    header_validated: DataFrame,
    finetune_jobs: DataFrame | None,
    limit: int = 500,
) -> DataFrame:
    """S11+J11: newest `limit` validated orders NOT yet consumed by a
    succeeded finetune job (non-equi anti-join on completion time), shaped as
    one JSONL chat-message row per order."""
    base = header_validated.filter(F.col("estado") == "APROBADA")
    if finetune_jobs is not None:
        done = finetune_jobs.filter(F.col("estado") == "SUCCEEDED").select(
            F.col("completado_en").alias("_ft_done")
        )
        # NOT EXISTS (job completed after this order was validated)
        base = base.join(
            F.broadcast(done),
            base.validado_en <= done._ft_done,
            "left_anti",
        )
    newest = base.orderBy(F.desc("validado_en"), F.desc("doc_id")).limit(limit)
    messages = F.to_json(
        F.struct(
            F.array(
                F.struct(
                    F.lit("user").alias("role"),
                    F.concat(
                        F.lit("Extraer orden medica: paciente "),
                        F.coalesce("paciente_nombre", F.lit("?")),
                    ).alias("content"),
                ),
                F.struct(
                    F.lit("assistant").alias("role"),
                    F.to_json(
                        F.struct(
                            "paciente_ci",
                            "medico_matricula",
                            "diagnostico_codigo_cie",
                            "n_practicas",
                        )
                    ).alias("content"),
                ),
            ).alias("messages")
        )
    )
    return newest.select("doc_id", messages.alias("jsonl"))


def should_trigger_training(
    unconsumed: DataFrame,
    threshold: int = 50,
    min_interval_h: float = 24.0,
    last_run_ts: float | None = None,
    now_ts: float | None = None,
) -> tuple[bool, int]:
    """Q7 (reference src/services/auto-training.service.js:10-42): the daily
    scheduled auto-training check — fire when AT LEAST ``threshold``
    unconsumed validated examples exist AND at least ``min_interval_h``
    hours passed since the last run. Returns (should_run, n_examples).
    ``now_ts`` injectable for deterministic tests; counting happens on the
    anti-joined unconsumed set (build_training_dataset's J11 input)."""
    import time as _time

    n = unconsumed.count()
    now = _time.time() if now_ts is None else now_ts
    due = last_run_ts is None or (now - last_run_ts) >= min_interval_h * 3600
    return (bool(n >= threshold and due), n)


PRECISION_FIELDS = [
    "paciente_nombre",
    "paciente_ci",
    "medico_matricula",
    "diagnostico_codigo_cie",
    "practicas",
]


def precision_metrics(header_validated: DataFrame, corrections: DataFrame) -> DataFrame:
    """metricas_precision analogue (reference database/schema_matching.sql:
    381-398): per-field extraction precision over VALIDATED documents.

    precision(campo) = 1 - (docs with a correction on campo / validated docs).
    corrections: (doc_id, campo, ...) — one row per corrected field instance;
    duplicates per (doc_id, campo) collapse. Output:
    (campo, n_validados, n_corregidos, precision)."""
    validated = header_validated.filter(
        F.col("estado").isin("APROBADA", "RECHAZADA")
    )
    base = validated.agg(F.count("*").alias("n_validados"))
    corr = (
        corrections.filter(F.col("campo").isin(*PRECISION_FIELDS))
        .dropDuplicates(["doc_id", "campo"])
        .groupBy("campo")
        .agg(F.count("*").alias("n_corregidos"))
    )
    fields_df = validated.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(f) for f in PRECISION_FIELDS])).alias("campo")
    )
    return (
        fields_df.crossJoin(F.broadcast(base))
        .join(F.broadcast(corr), "campo", "left")
        .select(
            "campo",
            "n_validados",
            F.coalesce("n_corregidos", F.lit(0)).alias("n_corregidos"),
            F.when(
                F.col("n_validados") > 0,
                F.round(
                    1.0
                    - F.coalesce("n_corregidos", F.lit(0))
                    / F.col("n_validados").cast("double"),
                    4,
                ),
            ).alias("precision"),
        )
    )


def webhook_outbox(header: DataFrame, secret: str = "whsec_demo") -> DataFrame:
    """S12 outbox rows: event name by state, JSON payload, real HMAC-SHA256
    signature (webhook.service.js:63,116 crypto.createHmac parity), retry
    schedule attached for the dispatcher."""
    from ..functions.text import hmac_sha256

    payload = F.to_json(
        F.struct(
            "doc_id", "estado", "confianza_general", "requiere_revision", "n_practicas"
        )
    )
    return header.select(
        "doc_id",
        F.when(F.col("estado") == "RECHAZADA", "previsacion.rechazada")
        .when(F.col("estado") == "APROBADA", "previsacion.aprobada")
        .otherwise("previsacion.generada")
        .alias("evento"),
        payload.alias("payload"),
        hmac_sha256(payload, secret).alias("firma"),
        F.lit(RETRY_SCHEDULE_S).alias("retry_schedule_s"),
        F.lit(0).alias("intentos"),
        F.lit("PENDIENTE").alias("estado_envio"),
    )
