"""End-to-end training-corpus curation DAG — the FineWeb/C4-shaped pipeline
composed from the repo's own operators:

    quality gate -> language gate -> repetition (Gopher) gate -> PII scrub
    -> exact dedup -> MinHash near-dup removal -> benchmark decontamination
    -> deterministic train/val/test split

Every stage is an existing, individually oracle- or pytest-proven operator
(text_analysis.quality_score / lang_id / repetition_features / scrub_pii,
dedup.exact_dedup / minhash_lsh_pairs / dedup_corpus,
datasets.contamination_pairs / hash_split); this plan is the composition a
user runs on the raw corpus, with per-stage row counters so a 10^12-doc
run reports its funnel without extra count() jobs.

Counter design (scale-aware): the four gate stages are a LINEAR trunk, so
their counts ride as df.observe() CollectMetrics nodes and are computed by
the ONE materialization the pipeline needs anyway — the localCheckpoint
that sits between the trunk and the dedup stages. The checkpoint is not
optional bookkeeping: the near-dup and decontamination stages branch
(self-join shapes that read the cleaned corpus more than once), and
without a materialization each branch would re-execute the trunk AND
double-count the observed metrics. Persisting the filtered corpus before
multi-pass dedup is exactly what a production run does. The final count
observes on the output and lands with the caller's own action.

localCheckpoint trades fault-tolerance for speed (blocks live on executor
local disk; an executor loss makes them unrecoverable). At test/bench
scale that is the right call; a 10^12-doc run would swap the checkpoint
for a durable materialization — write the cleaned corpus to parquet (or a
SnapshotTable commit, which also records the trunk counters in its
manifest) and read it back for the dedup stages. The plan shape and the
counter semantics are identical either way; only the barrier's storage
differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..operators.datasets import contamination_pairs, hash_split
from ..operators.dedup import dedup_corpus, exact_dedup, minhash_lsh_pairs
from ..operators.text_analysis import (
    lang_id,
    quality_score,
    repetition_features,
    scrub_pii,
)


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench: DataFrame | None = None,
    min_quality: float = 0.3,
    min_tokens: int = 5,
    allowed_langs: tuple[str, ...] = ("en", "es", "fr", "de"),
    max_dup_word_fraction: float = 0.5,
    max_symbol_word_ratio: float = 0.3,
    jaccard_threshold: float = 0.8,
    split_fractions: dict[str, float] | None = None,
) -> tuple[DataFrame, dict[str, Observation]]:
    """Returns (curated, observations).

    `curated` carries the original columns plus the stage features
    (quality, lang_guess, repetition fractions), the scrubbed text, and
    the deterministic `split` label. `observations` maps stage name ->
    pyspark Observation; the trunk counters (rows_in, rows_quality,
    rows_lang, rows_clean) are already populated when this function
    returns (the checkpoint materialized them); `rows_final` populates
    with the caller's first action on `curated`.
    """
    obs = {
        name: Observation(name)
        for name in (
            "rows_in",
            "rows_quality",
            "rows_lang",
            "rows_clean",
            "rows_final",
        )
    }

    def counted(frame: DataFrame, name: str) -> DataFrame:
        return frame.observe(obs[name], F.count(F.lit(1)).alias("rows"))

    trunk = counted(df, "rows_in")
    trunk = counted(
        quality_score(trunk, text_col).filter(
            (F.col("quality") >= min_quality)
            & (F.col("n_tokens") >= min_tokens)
        ),
        "rows_quality",
    )
    trunk = counted(
        lang_id(trunk, text_col).filter(
            F.col("lang_guess").isin(*allowed_langs)
        ),
        "rows_lang",
    )
    trunk = counted(
        repetition_features(trunk, text_col).filter(
            (F.col("dup_word_fraction") <= max_dup_word_fraction)
            & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
        ),
        "rows_clean",
    )
    cleaned = scrub_pii(trunk, text_col).localCheckpoint()

    # exact dedup: keep min(id) per content hash (left-semi against the
    # survivor-id set; ids only cross the join)
    keep = exact_dedup(cleaned, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    deduped = cleaned.join(keep, id_col, "left_semi")

    # near-dup removal: LSH pairs -> components -> anti-join drop-list
    pairs = minhash_lsh_pairs(
        deduped, text_col, id_col, jaccard_threshold=jaccard_threshold
    )
    survivors = dedup_corpus(deduped, pairs, id_col)

    if bench is not None:
        contaminated = contamination_pairs(
            survivors, bench, text_col, id_col
        ).select(F.col("train_id").alias(id_col)).distinct()
        survivors = survivors.join(contaminated, id_col, "left_anti")

    # hash_split keys on md5(string); numeric ids ride through a cast
    keyed = survivors.withColumn(
        "_split_key", F.col(id_col).cast("string")
    )
    final = counted(
        hash_split(keyed, "_split_key", split_fractions).drop("_split_key"),
        "rows_final",
    )
    return final, obs


def curation_report(observations: dict[str, Observation]) -> dict[str, int]:
    """Flatten populated observations to {stage: rows}. Call after an
    action on the curated frame so rows_final is available."""
    return {name: int(o.get["rows"]) for name, o in observations.items()}
