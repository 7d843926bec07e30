"""Span extraction + reassembly — the flagship pipeline core.

Input (BASELINE.json input_hint):
    documents_interleaved(doc_id string,
                          spans array<struct<kind,text,media_ref,offset:int>>)
    media(media_ref string, layout_json string, width int, height int)

Output invariant (the span-sequence-equality gate): per document, the ordered
sequence (kind, text, media_ref, order) with order = 1-based rank of offset;
text = density-stripped main content for text spans, XY-cut reading-order text
for media spans.

Scale design (10^12 docs / 100 TB):
  * explode(spans) is narrow — no shuffle;
  * text spans never touch the media join: the plan splits by kind, joins only
    the media subset on media_ref (both sides hash-partitioned on the key;
    production tables are bucketed by media_ref so this is shuffle-free),
    then unions back — a 25% media fraction means 75% of rows skip the join;
  * span ordering uses a window over (doc_id, offset). Spans-per-doc is
    bounded (10^3 pathological), so per-key state is tiny; AQE skew-join
    handles stragglers. Reassembly to arrays uses
    sort_array(collect_list(struct(offset, ...))) — NEVER shuffle order;
  * all per-span text work is Arrow pandas UDFs, everything else is
    whole-stage-codegen column expressions.

Reference parity: replaces the GPT-4o Vision + pdftoppm worker loop
(/root/reference/src/workers/previsacion.worker.js:18-227) with deterministic
vectorized operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.extraction_udfs import (
    extract_fields_udf,
    layout_text_udf,
    strip_boilerplate_udf,
)

SPAN_COLS = ["doc_id", "kind", "text", "media_ref", "offset"]


def exploded_spans(docs: DataFrame) -> DataFrame:
    """documents_interleaved -> one row per span (narrow transform)."""
    return docs.select(
        "doc_id",
        F.explode("spans").alias("s"),
    ).select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")


def clean_spans(
    docs: DataFrame, media: DataFrame, broadcast_media: bool = False
) -> DataFrame:
    """Per-span cleaned text: boilerplate-strip for text, XY-cut for media.

    Returns (doc_id, kind, text, media_ref, offset) with text cleaned.

    ``broadcast_media=True`` turns the media lookup into a broadcast hash
    join — zero exchanges on the span side. Right when the media table fits
    executor memory (benches, per-tenant slices). At 10^12-doc scale the
    media table is itself huge: leave False and bucket BOTH tables by
    media_ref so the sort-merge join is co-located and shuffle-free.
    """
    spans = exploded_spans(docs)

    text_part = spans.filter(F.col("kind") == "text").withColumn(
        "text", strip_boilerplate_udf(F.col("text"))
    )

    media_dim = media.select("media_ref", "layout_json")
    if broadcast_media:
        media_dim = F.broadcast(media_dim)
    media_part = (
        spans.filter(F.col("kind") == "media")
        .drop("text")
        # 1:1 join; media_ref is unique on both sides.
        .join(media_dim, "media_ref", "left")
        .withColumn("text", layout_text_udf(F.col("layout_json")))
        .drop("layout_json")
    )

    return text_part.select(*SPAN_COLS).unionByName(media_part.select(*SPAN_COLS))


def ordered_spans(
    docs: DataFrame, media: DataFrame, broadcast_media: bool = False
) -> DataFrame:
    """The span-sequence table: (doc_id, kind, text, media_ref, order).

    order = 1-based rank of offset within the document (offsets are unique
    per doc by construction; ties would break deterministically by offset).
    """
    w = Window.partitionBy("doc_id").orderBy("offset")
    return (
        clean_spans(docs, media, broadcast_media)
        .withColumn("order", F.row_number().over(w).cast("int"))
        .drop("offset")
    )


def reassembled_docs(
    docs: DataFrame, media: DataFrame, broadcast_media: bool = False
) -> DataFrame:
    """One row per doc: ordered span array + full_text.

    spans: array<struct<kind,text,media_ref,order>> sorted by order via
    sort_array on a struct with `order` leading — explicitly NOT relying on
    collect_list/shuffle order (SURVEY.md §7 hard parts).
    """
    cleaned = clean_spans(docs, media, broadcast_media)
    agg = cleaned.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
        ).alias("_sorted")
    )
    spans = F.transform(
        "_sorted",
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            (i + 1).cast("int").alias("order"),
        ),
    )
    full_text = F.array_join(
        F.transform(
            F.filter("_sorted", lambda s: s["text"].isNotNull() & (s["text"] != "")),
            lambda s: s["text"],
        ),
        " ",
    )
    return agg.select(
        "doc_id", spans.alias("spans"), full_text.alias("full_text")
    )


def extract_documents(
    docs: DataFrame, media: DataFrame, broadcast_media: bool = False
) -> DataFrame:
    """Full extraction: reassembled spans + structured fields + confidence.

    Output: doc_id, spans, full_text, fields.* (struct columns), plus
    requiere_revision (= confianza_extraccion < REVIEW_THRESHOLD,
    reference pre-visacion.service.js:55).
    """
    from .. import config

    assembled = reassembled_docs(docs, media, broadcast_media)
    with_fields = assembled.withColumn("fields", extract_fields_udf(F.col("full_text")))
    return with_fields.withColumn(
        "requiere_revision",
        F.col("fields.confianza_extraccion") < F.lit(config.REVIEW_THRESHOLD),
    )


def reassembled_docs_salted(
    docs: DataFrame, media: DataFrame, n_salts: int = 16,
    broadcast_media: bool = False,
) -> DataFrame:
    """Skew-mitigated two-phase reassembly for pathological many-span docs
    (north_rule salted-key mitigation; SURVEY §7 hard parts).

    Phase 1: groupBy(doc_id, salt) where salt = pmod(hash(offset), n_salts) —
    a hot document's spans spread over n_salts reducers, each producing a
    sorted partial list. Phase 2: groupBy(doc_id) merges the (salt-tagged)
    partials and flattens them back into one offset-sorted sequence.

    Ordering is preserved because BOTH phases sort on offset (structs with
    offset leading), never on arrival order. Output schema == reassembled_docs.
    """
    cleaned = clean_spans(docs, media, broadcast_media)

    phase1 = (
        cleaned.withColumn("_salt", F.pmod(F.hash("offset"), F.lit(n_salts)))
        .groupBy("doc_id", "_salt")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
            ).alias("_part")
        )
    )

    merged = phase1.groupBy("doc_id").agg(
        F.sort_array(F.flatten(F.collect_list("_part"))).alias("_sorted")
    )

    spans = F.transform(
        "_sorted",
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            (i + 1).cast("int").alias("order"),
        ),
    )
    full_text = F.array_join(
        F.transform(
            F.filter("_sorted", lambda s: s["text"].isNotNull() & (s["text"] != "")),
            lambda s: s["text"],
        ),
        " ",
    )
    return merged.select("doc_id", spans.alias("spans"), full_text.alias("full_text"))
