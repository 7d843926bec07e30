"""Pure-Python golden reference extractor (the pytest oracle).

Single-threaded, dependency-free (stdlib only). Defines the *semantics* the
distributed Spark pipeline must reproduce exactly:

  1. span ordering: rank spans by ``offset`` ascending; output ``order`` is the
     1-based rank — the span-sequence-equality invariant
     (kind, text, media_ref, order) from BASELINE.json;
  2. text spans: text-density + tag-ratio boilerplate strip (deterministic
     replacement for the reference's GPT-4o Vision read,
     /root/reference/src/services/gpt-vision.service.js:45-99);
  3. media spans: XY-cut reading-order reconstruction over the block layout
     (replacement for pdftoppm page rendering,
     /root/reference/src/services/pdf.service.js:17-109);
  4. field extraction: regex state machines for patient/CI/date/matricula/
     diagnosis/CIE-10/urgency/practices with narrative fallback
     (/root/reference/src/prompts/system.prompt.js:91-159,
      src/workers/previsacion.worker.js:229-263);
  5. confidence fold + review flag
     (/root/reference/src/services/gpt-vision.service.js:209-243,
      src/services/pre-visacion.service.js:55).

The Spark implementation lives in ``medical_ocr_service_spark.functions`` /
``operators`` and is written independently (vectorized pandas); the pytest
suite asserts bit-exact agreement between the two.
"""

from __future__ import annotations

import json
import re
from typing import Any

from .. import config

_WS_RE = re.compile(r"\s+")
_TAG_RE = re.compile(config.TAG_REGEX)
_TAG_COUNT_RE = re.compile(config.TAG_COUNT_REGEX)


def collapse_ws(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


# ---------------------------------------------------------------------------
# 1. Boilerplate strip (text spans)
# ---------------------------------------------------------------------------

def strip_boilerplate(raw: str | None) -> str | None:
    """Text-density + tag-ratio main-content extraction.

    Per line: density = len(visible_text) / (tag_count + 1). Lines with
    density >= TEXT_DENSITY_THRESHOLD survive; tags are stripped from
    survivors; survivors join with single spaces.
    """
    if raw is None:
        return None
    if "<" not in raw:
        return collapse_ws(raw)
    kept: list[str] = []
    for line in raw.split("\n"):
        tags = len(_TAG_COUNT_RE.findall(line))
        visible = collapse_ws(_TAG_RE.sub(" ", line))
        if not visible:
            continue
        density = len(visible) / (tags + 1.0)
        if density >= config.TEXT_DENSITY_THRESHOLD:
            kept.append(visible)
    return " ".join(kept)


# ---------------------------------------------------------------------------
# 2. XY-cut reading order (media spans)
# ---------------------------------------------------------------------------

def _split_on_axis(blocks: list[dict], axis: str) -> list[list[dict]] | None:
    lo, hi = ("y0", "y1") if axis == "y" else ("x0", "x1")
    ordered = sorted(blocks, key=lambda b: (b[lo], b[hi]))
    groups: list[list[dict]] = []
    cur = [ordered[0]]
    cur_max = ordered[0][hi]
    for b in ordered[1:]:
        if b[lo] - cur_max >= config.XY_CUT_MIN_GAP:
            groups.append(cur)
            cur = [b]
            cur_max = b[hi]
        else:
            cur.append(b)
            cur_max = max(cur_max, b[hi])
    groups.append(cur)
    return groups if len(groups) > 1 else None


def xy_cut_order(blocks: list[dict]) -> list[dict]:
    """Recursive XY-cut: horizontal cuts (y) first, then vertical (x);
    leaves sort by (y0, x0)."""
    if len(blocks) <= 1:
        return list(blocks)
    groups = _split_on_axis(blocks, "y")
    if groups is None:
        groups = _split_on_axis(blocks, "x")
    if groups is None:
        return sorted(blocks, key=lambda b: (b["y0"], b["x0"]))
    out: list[dict] = []
    for g in groups:
        out.extend(xy_cut_order(g))
    return out


def layout_to_text(layout_json: str | None) -> str | None:
    if layout_json is None:
        return None
    layout = json.loads(layout_json)
    ordered = xy_cut_order(layout.get("blocks", []))
    return collapse_ws(" ".join(b.get("text", "") for b in ordered))


# ---------------------------------------------------------------------------
# 3. Field extraction (regex state machines)
# ---------------------------------------------------------------------------

_RUC_RE = re.compile(r"RUC:\s*([\d\-]+)")
_PRESTADOR_RE = re.compile(r"ORDEN MEDICA - (.+?)\s+RUC:")
_PACIENTE_RE = re.compile(r"Paciente:\s*(.+?)\s+CI[:\s]")
_CI_RE = re.compile(r"CI:\s*([\d.\-]+)")
_FECHA_RE = re.compile(r"\b(\d{2})/(\d{2})/(\d{4})\b")
_DIAG_RE = re.compile(r"Diagn[óo]stico:\s*(.+?)\s*\(([A-Z]\d{2}(?:\.\d)?)\)")
_PRACT_SEG_RE = re.compile(r"PRACTICAS:\s*(.+?)\.(?:\s|$)")
_PRACT_ITEM_RE = re.compile(r"^(.*?)(?:\s+x(\d+))?$")
_MATRICULA_RES = [re.compile(p, re.IGNORECASE) for p in config.MATRICULA_PATTERNS]
_URGENCY_RE = re.compile(
    r"\b(" + "|".join(config.URGENCY_KEYWORDS) + r")\b", re.IGNORECASE
)
_NARRATIVE_RES = [
    (re.compile(p, re.IGNORECASE), name)
    for p, name in config.NARRATIVE_PRACTICE_PATTERNS
]


def extract_fields(full_text: str) -> dict[str, Any]:
    """Extract the structured order fields from a document's cleaned text."""
    m = _RUC_RE.search(full_text)
    ruc = m.group(1) if m else None
    m = _PRESTADOR_RE.search(full_text)
    prestador_nombre = collapse_ws(m.group(1)) if m else None
    m = _PACIENTE_RE.search(full_text)
    nombre = collapse_ws(m.group(1)) if m else None
    m = _CI_RE.search(full_text)
    ci = re.sub(r"[.\-]", "", m.group(1)) if m else None
    m = _FECHA_RE.search(full_text)
    fecha = f"{m.group(3)}-{m.group(2)}-{m.group(1)}" if m else None
    m = _DIAG_RE.search(full_text)
    diagnostico, cie = (collapse_ws(m.group(1)), m.group(2)) if m else (None, None)

    matricula = None
    for rx in _MATRICULA_RES:
        m = rx.search(full_text)
        if m:
            matricula = m.group(1)
            break
    matricula_valida = bool(
        matricula
        and config.MATRICULA_MIN_LEN <= len(matricula) <= config.MATRICULA_MAX_LEN
    )

    urgente = bool(_URGENCY_RE.search(full_text))

    practicas: list[dict[str, Any]] = []
    fuente = "LISTA"
    seg = _PRACT_SEG_RE.search(full_text)
    if seg:
        for raw_item in seg.group(1).split(";"):
            item = collapse_ws(raw_item)
            if not item:
                continue
            im = _PRACT_ITEM_RE.match(item)
            desc = collapse_ws(im.group(1))
            qty = int(im.group(2)) if im.group(2) else config.DEFAULT_CANTIDAD
            if desc:
                practicas.append(
                    {
                        "descripcion": desc,
                        "cantidad": qty,
                        "confianza": config.DEFAULT_PRACTICE_CONFIDENCE,
                    }
                )
    if not practicas:
        fuente = "NARRATIVA"
        for rx, name in _NARRATIVE_RES:
            if rx.search(full_text):
                practicas.append(
                    {
                        "descripcion": name,
                        "cantidad": config.DEFAULT_CANTIDAD,
                        "confianza": config.NARRATIVE_PRACTICE_CONFIDENCE,
                    }
                )
    # item = 1-based input order (pre-visacion.service.js:106,170)
    for i, p in enumerate(practicas):
        p["item"] = i + 1

    return {
        "ruc": ruc,
        "prestador_nombre": prestador_nombre,
        "paciente_nombre": nombre,
        "paciente_ci": ci,
        "fecha_orden": fecha,
        "diagnostico_texto": diagnostico,
        "diagnostico_codigo_cie": cie,
        "medico_matricula": matricula,
        "matricula_valida": matricula_valida,
        "urgente": urgente,
        "practicas": practicas,
        "practicas_fuente": fuente if practicas else None,
    }


# ---------------------------------------------------------------------------
# 4. Confidence fold
# ---------------------------------------------------------------------------

def confidence_fold(fields: dict[str, Any]) -> float:
    """0.7 * weighted checklist + 0.3 * mean practice confidence, 2dp clamp."""
    w = config.CONFIDENCE_WEIGHTS
    total = sum(w.values())
    got = 0.0
    if fields["paciente_nombre"]:
        got += w["paciente_nombre"]
    if fields["paciente_ci"]:
        got += w["paciente_ci"]
    if fields["matricula_valida"]:
        got += w["medico_matricula"]
    if fields["fecha_orden"]:
        got += w["fecha_orden"]
    if fields["diagnostico_texto"]:
        got += w["diagnostico"]
    if fields["urgente"]:
        got += w["urgencia_detectada"]
    if fields["practicas"]:
        got += w["practicas"]
    checklist = got / total
    confs = [p["confianza"] for p in fields["practicas"]]
    mean_pc = sum(confs) / len(confs) if confs else 0.0
    score = 0.7 * checklist + 0.3 * mean_pc
    return round(min(1.0, score), 2)


# ---------------------------------------------------------------------------
# 5. Whole-document golden extraction
# ---------------------------------------------------------------------------

def extract_document(doc: dict[str, Any], media_map: dict[str, str]) -> dict[str, Any]:
    """Run the full golden pipeline on one raw document row.

    Returns {doc_id, spans:[{kind,text,media_ref,order}], full_text, fields,
    confianza_extraccion, requiere_revision}.
    """
    ordered = sorted(doc["spans"], key=lambda s: s["offset"])
    out_spans: list[dict[str, Any]] = []
    texts: list[str] = []
    for rank, s in enumerate(ordered, start=1):
        if s["kind"] == "media":
            text = layout_to_text(media_map.get(s["media_ref"]))
        else:
            text = strip_boilerplate(s["text"])
        out_spans.append(
            {
                "kind": s["kind"],
                "text": text,
                "media_ref": s["media_ref"],
                "order": rank,
            }
        )
        if text:
            texts.append(text)
    full_text = " ".join(texts)
    fields = extract_fields(full_text)
    conf = confidence_fold(fields)
    return {
        "doc_id": doc["doc_id"],
        "spans": out_spans,
        "full_text": full_text,
        "fields": fields,
        "confianza_extraccion": conf,
        "requiere_revision": conf < config.REVIEW_THRESHOLD,
    }


def extract_corpus(
    docs: list[dict[str, Any]], media_rows: list[dict[str, Any]]
) -> list[dict[str, Any]]:
    media_map = {m["media_ref"]: m["layout_json"] for m in media_rows}
    return [extract_document(d, media_map) for d in docs]
