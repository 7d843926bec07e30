"""End-to-end curation DAG: funnel semantics + counter correctness on a
hand-built corpus where every stage has a known victim, then a smoke run
over the sf0.001 documents table."""

from __future__ import annotations

import pytest

from medical_ocr_service_spark.plans.curation import (
    curate_corpus,
    curation_report,
)

GOOD = (
    "the cat sat on the mat and the dog sat near the door while the "
    "birds sang in the morning light over the quiet garden of the house"
)


def _corpus(spark):
    rows = [
        (1, GOOD),
        (2, GOOD + " extra tail words for the second document version"),
        (3, GOOD),  # exact duplicate of 1 -> exact-dedup victim (keep min id)
        (4, "tiny"),  # quality victim (n_tokens < 5)
        (5, "zzz qqq www " * 20),  # lang victim (no stopwords -> und)
        # repetition victim: passes quality + lang (stopwords present)
        # but one word repeated far past the dup-word threshold
        (6, "the " + "spam " * 60 + "of and to in is that a " * 3),
        # PII survivor: 10 extra words keep shingle Jaccard vs doc 1 below
        # the 0.8 near-dup bar (24 shared / 34 total ~ 0.71)
        (7, GOOD + " please email me at someone@example.com for more details today thanks"),
        # near-dup victim: 2 extra words -> Jaccard 24/26 ~ 0.92 vs doc 1
        (8, GOOD + " small tail"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_curate_corpus_funnel_and_counters(spark):
    curated, obs = curate_corpus(
        _corpus(spark),
        min_quality=0.3,
        min_tokens=5,
        max_dup_word_fraction=0.5,
        jaccard_threshold=0.8,
    )
    rows = curated.collect()
    report = curation_report(obs)

    assert report["rows_in"] == 8
    assert report["rows_quality"] == 7          # doc 4 out
    assert report["rows_lang"] == 6             # doc 5 out
    assert report["rows_clean"] == 5            # doc 6 out
    ids = {r["doc_id"] for r in rows}
    # doc 3 is an exact dup of doc 1 (min id 1 kept); doc 8 is a near-dup
    # of doc 1 (LSH pair -> component -> dropped)
    assert ids == {1, 2, 7}
    assert report["rows_final"] == 3
    # PII scrub happened before the output
    mail_doc = next(r for r in rows if r["doc_id"] == 7)
    assert "someone@example.com" in mail_doc["text"]  # original kept
    assert "someone@example.com" not in mail_doc["text_scrubbed"]
    assert "<EMAIL>" in mail_doc["text_scrubbed"]
    # split labels present and deterministic
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    again, _ = curate_corpus(_corpus(spark))
    assert {(r["doc_id"], r["split"]) for r in again.collect()} == {
        (r["doc_id"], r["split"]) for r in rows
    }


def test_curate_corpus_decontamination(spark):
    bench = spark.createDataFrame([(900, GOOD)], ["doc_id", "text"])
    curated, obs = curate_corpus(_corpus(spark), bench=bench)
    ids = {r["doc_id"] for r in curated.collect()}
    # doc 1 (and its near-dup family) share >=3 shingles with the bench
    # doc -> decontaminated away
    assert 1 not in ids
    report = curation_report(obs)
    assert report["rows_final"] == len(ids)


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001"])
def test_curate_corpus_testdata_smoke(spark, sf):
    df = spark.read.parquet(f"{sf}/documents.parquet")
    curated, obs = curate_corpus(df)
    n = curated.count()
    report = curation_report(obs)
    assert report["rows_in"] == df.count()
    assert (
        report["rows_in"]
        >= report["rows_quality"]
        >= report["rows_lang"]
        >= report["rows_clean"]
        >= report["rows_final"]
        == n
    )
    assert n > 0
    cols = set(curated.columns)
    assert {"doc_id", "text", "quality", "lang_guess", "split"} <= cols
