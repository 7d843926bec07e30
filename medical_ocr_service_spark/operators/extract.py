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
  * text spans never touch media resolution: the plan splits by kind and only
    the media subset resolves payloads, via one of three strategies
    (clean_spans media_strategy): media_ref join with both tables bucketed by
    media_ref (shuffle-free at scale), broadcast hash join for
    fits-in-memory media, or the denormalized union (media sidecar carries
    (doc_id, offset) owner keys -> zero joins, groupBy(doc_id) is the plan's
    only exchange);
  * span ordering uses a window over (doc_id, offset). Spans-per-doc is
    bounded (10^3 pathological), so per-key state is tiny; AQE skew-join
    handles stragglers. Reassembly to arrays uses
    sort_array(collect_list(struct(offset, ...))) — NEVER shuffle order;
  * text-span cleaning is pure whole-stage-codegen column expressions
    (strip_boilerplate_col — no Python at all on that branch); the only
    Arrow pandas UDFs left are the XY-cut layout parse (recursive) and the
    per-doc field extraction (many-regex-per-row, measured faster in
    compiled re than as a catalyst expression tree).

Reference parity: replaces the GPT-4o Vision + pdftoppm worker loop
(/root/reference/src/workers/previsacion.worker.js:18-227) with deterministic
vectorized operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.extraction_udfs import (
    extract_fields_udf,
    strip_boilerplate_col,
)

SPAN_COLS = ["doc_id", "kind", "text", "media_ref", "offset"]


def exploded_spans(docs: DataFrame) -> DataFrame:
    """documents_interleaved -> one row per span (narrow transform)."""
    return docs.select(
        "doc_id",
        F.explode("spans").alias("s"),
    ).select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")


def clean_spans(
    docs: DataFrame,
    media: DataFrame,
    media_strategy: str = "join",
    with_errors: bool = False,
) -> DataFrame:
    """Per-span cleaned text: boilerplate-strip for text, XY-cut for media.

    Returns (doc_id, kind, text, media_ref, offset) with text cleaned.

    ``media_strategy`` picks how media_ref payloads are resolved:

    * ``"join"`` (default, always correct): sort-merge/shuffle join of the
      media spans against the media table on media_ref. At 10^12-doc scale
      both tables are bucketed by media_ref so this is co-located and
      shuffle-free.
    * ``"broadcast"``: broadcast hash join — zero exchanges on the span side,
      but pays a serial driver-side hash-relation build per action. Right
      when the media table fits executor memory and the job is long.
    * ``"denormalized"``: NO join at all. Requires the media sidecar to carry
      the owner keys ``(doc_id, offset)`` (written at ingest — see
      corpus.generator) and to contain EXACTLY the media spans of ``docs``
      (full-corpus runs; do not use under a pending-docs filter such as
      checkpoint resume unless the media side is filtered identically).
      Media rows are layout-parsed straight off their scan and unioned into
      the span stream; the groupBy(doc_id) exchange is the plan's ONLY
      shuffle and there is no broadcast build.

    ``with_errors=True`` adds an ``_err`` column (Q3 quarantine): a media
    span whose layout payload fails to parse carries the error string
    instead of failing the task; text spans always have ``_err`` NULL.
    """
    from ..functions.extraction_udfs import (
        apply_pruned_layout,
        layout_text_err_udf,
    )

    spans = exploded_spans(docs)

    # JVM-native density strip (strip_boilerplate_col): the text-span branch
    # carries NO Python stage at all — whole-stage codegen end to end. The
    # Arrow-UDF twin (strip_boilerplate_udf) is kept as the reference
    # implementation; pytest asserts their equality.
    text_part = spans.filter(F.col("kind") == "text").withColumn(
        "text", strip_boilerplate_col(F.col("text"))
    )
    if with_errors:
        text_part = text_part.withColumn("_err", F.lit(None).cast("string"))
    cols = SPAN_COLS + (["_err"] if with_errors else [])

    if media_strategy == "denormalized":
        missing = {"doc_id", "offset"} - set(media.columns)
        if missing:
            raise ValueError(
                f"media_strategy='denormalized' needs owner keys in the media "
                f"table; missing columns: {sorted(missing)}"
            )
        media_part = media.select(
            "doc_id",
            F.lit("media").alias("kind"),
            "layout_json",
            "media_ref",
            F.col("offset").cast("int").alias("offset"),
        )
    else:
        media_dim = media.select("media_ref", "layout_json")
        if media_strategy == "broadcast":
            media_dim = F.broadcast(media_dim)
        media_part = (
            spans.filter(F.col("kind") == "media")
            .drop("text")
            # 1:1 join; media_ref is unique on both sides.
            .join(media_dim, "media_ref", "left")
        )
    if with_errors:
        # quarantine path (Q3): per-row error capture needs the raw payload
        # in Python, so it keeps the JSON Arrow UDF
        media_part = (
            media_part.withColumn("_lt", layout_text_err_udf(F.col("layout_json")))
            .withColumn("text", F.col("_lt.text"))
            .withColumn("_err", F.col("_lt.error"))
            .drop("_lt", "layout_json")
        )
    else:
        # pruned layout path: JVM from_json decodes the payload once, ONLY
        # block coordinates cross the Arrow boundary and a permutation
        # comes back (apply_pruned_layout) — the block text never ships to
        # Python in either direction, cutting the map stage's Python
        # traffic ~4x sent / ~12x returned (measured, BENCH/BASELINE.md
        # round 4) and removing the per-row json.loads worker-side. Byte
        # parity with the JSON UDF is pytest-asserted.
        media_part = apply_pruned_layout(media_part, src="layout_json").drop(
            "layout_json"
        )

    # media branch FIRST: a union stage schedules partitions in branch
    # order, and the media tasks are the slow (Python layout-parse) ones —
    # starting them first fills the stage tail with short JVM text tasks
    # instead of stragglers (LPT scheduling). Row order is irrelevant:
    # reassembly sorts by offset.
    return media_part.select(*cols).unionByName(text_part.select(*cols))


def ordered_spans(
    docs: DataFrame, media: DataFrame, media_strategy: str = "join"
) -> DataFrame:
    """The span-sequence table: (doc_id, kind, text, media_ref, order).

    order = 1-based rank of offset within the document. Offsets are unique
    per document — the input contract (duplicate offsets would tie-break by
    the remaining struct fields in reassembled_docs but by arrival order
    here; don't feed malformed docs).
    """
    w = Window.partitionBy("doc_id").orderBy("offset")
    return (
        clean_spans(docs, media, media_strategy)
        .withColumn("order", F.row_number().over(w).cast("int"))
        .drop("offset")
    )


def reassembled_docs(
    docs: DataFrame, media: DataFrame, media_strategy: str = "join"
) -> DataFrame:
    """One row per doc: ordered span array + full_text.

    spans: array<struct<kind,text,media_ref,order>> sorted by order via
    sort_array on a struct with `order` leading — explicitly NOT relying on
    collect_list/shuffle order (SURVEY.md §7 hard parts).
    """
    cleaned = clean_spans(docs, media, media_strategy)
    return _reassemble_cleaned(cleaned)


def _finish_reassembly(agg: DataFrame) -> DataFrame:
    """(doc_id, _sorted) -> (doc_id, spans, full_text).

    `_sorted` is the offset-ordered array<struct<offset,kind,text,media_ref>>;
    this derives the 1-based `order` ranks and the space-joined full_text.
    Shared tail of the shuffle, salted and co-located reassembly variants.
    """
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


def _reassemble_cleaned(cleaned: DataFrame) -> DataFrame:
    """groupBy(doc_id) + sort_array reassembly of a cleaned span frame."""
    agg = cleaned.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
        ).alias("_sorted")
    )
    return _finish_reassembly(agg)


def reassembled_docs_colocated(docs: DataFrame, media: DataFrame) -> DataFrame:
    """Shuffle-FREE reassembly for doc_id-co-partitioned inputs.

    The 100 TB plan: when `docs` and `media` are bucketed (Iceberg: hash
    bucket-partitioned) by doc_id with the same bucket count, this plan has
    ZERO exchanges — tests/test_extraction.py asserts `Exchange` is absent:

      1. media.groupBy(doc_id) collects RAW (media_ref, layout_json) pairs —
         pure JVM, satisfied by the bucketing, no shuffle. The layout parse
         deliberately does NOT run here: ArrowEvalPython drops the child's
         hash partitioning, so a UDF between the bucketed scan and the
         groupBy would re-introduce the exchange (measured; see
         layout_entries_udf).
      2. sort-merge join docs <- media lists on doc_id ('merge' hint: the
         per-doc media list is corpus-sized at 10^12 docs — never a
         broadcast candidate). Both sides share the bucketing: no exchange,
         only partition-local sorts.
      3. layout_entries_udf parses the joined lists (post-join Python is
         harmless — nothing downstream needs a distribution), and a single
         higher-order transform over the spans ARRAY cleans text spans
         JVM-side (strip_boilerplate_col inside the lambda) and resolves
         media spans from the per-doc map. No explode, no re-group: the
         span array never leaves its row.

    Requires the media sidecar to carry the owner key doc_id (written at
    ingest — corpus.generator). Unlike media_strategy='denormalized' this IS
    resume-safe: media rows join on doc_id, so media of already-done
    (filtered-out) docs simply drops out instead of resurrecting spans.

    Output and semantics are identical to reassembled_docs (golden-equality
    tested); `order` remains the 1-based offset rank via sort_array.
    """
    from ..functions.extraction_udfs import layout_entries_udf

    if "doc_id" not in media.columns:
        raise ValueError(
            "reassembled_docs_colocated needs the owner key doc_id in the "
            "media table (see corpus.generator denormalized sidecar)"
        )
    # Output parity with the default plan: explode() eliminates empty and
    # NULL span arrays, so the groupBy path emits NO row for a span-less
    # document — this plan must drop them too (size(NULL) = -1, so one
    # predicate covers both). Without it, a span-less doc would get a row
    # with empty spans + fields extracted from '', skewing docs_processed
    # counters and marking it done under checkpointed resume.
    docs = docs.filter(F.size("spans") > 0)
    media_lists = media.groupBy("doc_id").agg(
        F.collect_list(F.struct("media_ref", "layout_json")).alias("_mraw")
    )
    joined = (
        docs.join(media_lists.hint("merge"), "doc_id", "left")
        .withColumn("_mtxt", F.map_from_entries(layout_entries_udf(F.col("_mraw"))))
        .drop("_mraw")
    )
    cleaned_arr = F.transform(
        "spans",
        lambda s: F.struct(
            s["offset"].alias("offset"),
            s["kind"].alias("kind"),
            F.when(
                s["kind"] == F.lit("text"), strip_boilerplate_col(s["text"])
            )
            .otherwise(F.col("_mtxt")[s["media_ref"]])
            .alias("text"),
            s["media_ref"].alias("media_ref"),
        ),
    )
    agg = joined.select("doc_id", F.sort_array(cleaned_arr).alias("_sorted"))
    return _finish_reassembly(agg)


def extract_documents(
    docs: DataFrame,
    media: DataFrame,
    media_strategy: str = "join",
    salted: bool = False,
) -> DataFrame:
    """Full extraction: reassembled spans + structured fields + confidence.

    Output: doc_id, spans, full_text, fields.* (struct columns), plus
    requiere_revision (= confianza_extraccion < REVIEW_THRESHOLD,
    reference pre-visacion.service.js:55).

    ``salted=True`` swaps in the two-phase salted reassembly
    (reassembled_docs_salted) for corpora with pathological many-span docs;
    ``media_strategy`` as in clean_spans.
    """
    if salted:
        assembled = reassembled_docs_salted(
            docs, media, media_strategy=media_strategy
        )
    else:
        assembled = reassembled_docs(docs, media, media_strategy)
    # Field extraction stays an Arrow pandas UDF *by measurement*: the
    # JVM-expression twin (extract_fields_col, kept + parity-tested) built
    # an expression tree large enough to fall out of whole-stage codegen and
    # re-ran each regex per reference — 2x slower end-to-end at 4 cores
    # (90s vs 44s / 300k docs). Compiled re + one pass per doc in an Arrow
    # batch wins for this many-regex-per-row shape.
    return _with_fields(assembled)


def extract_documents_colocated(docs: DataFrame, media: DataFrame) -> DataFrame:
    """extract_documents over the zero-exchange co-located reassembly
    (reassembled_docs_colocated): same output schema and values, no shuffle
    anywhere in the plan when both inputs are bucketed by doc_id."""
    return _with_fields(reassembled_docs_colocated(docs, media))


def _with_fields(assembled: DataFrame) -> DataFrame:
    """Shared tail: structured-field extraction + review flag."""
    from .. import config

    with_fields = assembled.withColumn(
        "fields", extract_fields_udf(F.col("full_text"))
    )
    return with_fields.withColumn(
        "requiere_revision",
        F.col("fields.confianza_extraccion") < F.lit(config.REVIEW_THRESHOLD),
    )


def extract_documents_quarantine(
    docs: DataFrame,
    media: DataFrame,
    media_strategy: str = "join",
) -> tuple[DataFrame, DataFrame]:
    """Q3 (job-queue.service.js:193-238): extraction with per-row failure
    isolation. Returns (results, quarantine):

    * quarantine — one row per failed span: (doc_id, media_ref, error);
      a malformed layout payload lands here instead of failing the task;
    * results — extract_documents output for the documents with NO failed
      span. Quarantined documents are withheld entirely, so a checkpointed
      resume (CheckpointedExtraction) naturally retries them next run —
      the Spark analogue of the reference's attempt counter + re-queue.
    """
    cleaned = clean_spans(docs, media, media_strategy, with_errors=True)
    quarantine = cleaned.filter(F.col("_err").isNotNull()).select(
        "doc_id", "media_ref", F.col("_err").alias("error")
    )
    ok = cleaned.drop("_err").join(
        quarantine.select("doc_id").distinct(), "doc_id", "left_anti"
    )
    results = _with_fields(_reassemble_cleaned(ok))
    return results, quarantine


def reassembled_docs_salted(
    docs: DataFrame, media: DataFrame, n_salts: int = 16,
    media_strategy: str = "join",
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
    cleaned = clean_spans(docs, media, media_strategy)

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
    return _finish_reassembly(merged)
