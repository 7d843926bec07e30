"""Checkpoint/resume (Q4) + lineage counters (Q5) + streaming recovery."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from medical_ocr_service_spark.plans.checkpoint import CheckpointedExtraction


@pytest.fixture()
def loaded(spark, corpus_dir):
    docs = spark.read.parquet(f"{corpus_dir}/documents_interleaved.parquet")
    media = spark.read.parquet(f"{corpus_dir}/media.parquet")
    return docs, media


def test_resume_processes_only_pending(spark, loaded, tmp_path):
    docs, media = loaded
    ck = CheckpointedExtraction(str(tmp_path / "out"))
    first_half = docs.filter(F.col("doc_id") < "doc00000150")

    m1 = ck.run(first_half, media)
    assert m1["docs_processed"] == 150

    # resume over the FULL input: only the remaining docs are processed
    m2 = ck.run(docs, media)
    assert m2["docs_processed"] == docs.count() - 150

    results = ck.results(spark)
    assert results.count() == docs.count()
    assert results.select("doc_id").distinct().count() == docs.count()

    # third run: nothing pending
    m3 = ck.run(docs, media)
    assert m3["docs_processed"] == 0


def test_crash_recovery_exactly_once(spark, loaded, tmp_path):
    docs, media = loaded
    ck = CheckpointedExtraction(str(tmp_path / "out"))

    with pytest.raises(Exception):
        ck.run(docs, media, fail_on="doc00000100")

    # crashed run may have left partial appends; resume must complete the set
    ck.run(docs, media)
    results = ck.results(spark)
    assert results.count() == docs.count()
    assert results.select("doc_id").distinct().count() == docs.count()


def test_lineage_metrics_written(spark, loaded, tmp_path):
    docs, media = loaded
    ck = CheckpointedExtraction(str(tmp_path / "out"))
    m = ck.run(docs, media)
    files = glob.glob(os.path.join(str(tmp_path / "out"), "_lineage", "*.json"))
    assert len(files) == 1
    rec = json.load(open(files[0]))
    assert rec["docs_processed"] == docs.count()
    assert rec["spans_emitted"] > docs.count()
    assert "docs_review" in rec and "docs_missing_ci" in rec
    assert m["run_id"] == rec["run_id"]


def test_streaming_extraction_availablenow(spark, loaded, tmp_path):
    from medical_ocr_service_spark.streaming.pipeline import stream_extraction

    docs, media = loaded
    # stage the input as multiple files (a "queue" of landing files)
    docs_dir = str(tmp_path / "stream_in")
    docs.repartition(4).write.parquet(docs_dir)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")

    q = stream_extraction(spark, docs_dir, media, out, ckpt, available_now=True)
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    assert got.select("doc_id").distinct().count() == docs.count()

    # restart with no new files -> checkpoint prevents reprocessing
    q2 = stream_extraction(spark, docs_dir, media, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == docs.count()


def test_stream_stateful_dedup(spark, loaded, tmp_path):
    """applyInPandasWithState dedup: duplicates dropped across micro-batches
    and across restarts (state survives via checkpoint)."""
    from pyspark.sql import functions as F

    from medical_ocr_service_spark.streaming.pipeline import stream_dedup

    docs, _ = loaded
    subset = docs.limit(40).cache()
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    # batch 1: the subset itself (with an intra-batch duplicate copy)
    subset.unionByName(subset.limit(5)).repartition(3).write.mode("append").parquet(in_dir)
    q = stream_dedup(spark, in_dir, out, ckpt, available_now=True)
    q.awaitTermination(300)
    got1 = spark.read.parquet(out)
    assert got1.count() == 40  # intra-batch dups collapsed

    # batch 2 (restart): re-deliver 10 old docs (dups) + nothing new
    subset.limit(10).write.mode("append").parquet(in_dir)
    q2 = stream_dedup(spark, in_dir, out, ckpt, available_now=True)
    q2.awaitTermination(300)
    got2 = spark.read.parquet(out)
    assert got2.count() == 40  # cross-restart state drops re-delivered dups
    assert got2.select("content_hash").distinct().count() == 40


def test_denormalized_refused_on_resume(spark, loaded, tmp_path):
    """media_strategy='denormalized' must be refused once a snapshot exists
    (unfiltered media rows would resurrect spans of already-done docs)."""
    import pytest as _pytest

    from medical_ocr_service_spark.plans.checkpoint import CheckpointedExtraction

    docs, media = loaded
    ck = CheckpointedExtraction(str(tmp_path / "out"))
    # first run (full corpus): no snapshot yet -> denormalized allowed
    ck.run(docs, media, media_strategy="denormalized")
    with _pytest.raises(ValueError, match="denormalized"):
        ck.run(docs, media, media_strategy="denormalized")


def test_quarantine_retry_and_permanent_failure(spark, loaded, tmp_path):
    """Q3 (job-queue.service.js:193-238): an unparsable span quarantines its
    document (task does NOT fail), resume retries it, and after max_intentos
    the doc is excluded permanently with estado FAILED."""
    docs, media = loaded
    # find a doc that actually has a media span, then corrupt its payloads
    victim = media.select("doc_id").first()["doc_id"]
    bad_media = media.withColumn(
        "layout_json",
        F.when(F.col("doc_id") == victim, F.lit("{not json")).otherwise(
            F.col("layout_json")
        ),
    )
    ck = CheckpointedExtraction(str(tmp_path / "q"))

    m1 = ck.run(docs, bad_media, quarantine=True, max_intentos=2)
    n = docs.count()
    assert m1["docs_quarantined"] == 1
    assert m1["docs_processed"] == n - 1
    results = ck.results(spark)
    assert results.filter(F.col("doc_id") == victim).count() == 0
    fd = ck.failed_docs(spark, max_intentos=2).toPandas().set_index("doc_id")
    assert fd.loc[victim, "intentos"] == 1 and fd.loc[victim, "estado"] == "QUEUED"

    # retry still failing -> attempts exhausted -> FAILED
    m2 = ck.run(docs, bad_media, quarantine=True, max_intentos=2)
    assert m2["docs_quarantined"] == 1 and m2["docs_processed"] == 0
    fd = ck.failed_docs(spark, max_intentos=2).toPandas().set_index("doc_id")
    assert fd.loc[victim, "intentos"] == 2 and fd.loc[victim, "estado"] == "FAILED"

    # exhausted doc is excluded permanently — even though still pending
    m3 = ck.run(docs, bad_media, quarantine=True, max_intentos=2)
    assert m3["docs_quarantined"] == 0 and m3["docs_processed"] == 0


def test_quarantine_recovers_after_fix(spark, loaded, tmp_path):
    """A quarantined doc whose payload is fixed before exhaustion is
    extracted on the next resume."""
    docs, media = loaded
    victim = media.select("doc_id").first()["doc_id"]
    bad_media = media.withColumn(
        "layout_json",
        F.when(F.col("doc_id") == victim, F.lit("broken")).otherwise(
            F.col("layout_json")
        ),
    )
    ck = CheckpointedExtraction(str(tmp_path / "q2"))
    ck.run(docs, bad_media, quarantine=True, max_intentos=3)
    m2 = ck.run(docs, media, quarantine=True, max_intentos=3)  # payload fixed
    assert m2["docs_processed"] == 1 and m2["docs_quarantined"] == 0
    assert ck.results(spark).filter(F.col("doc_id") == victim).count() == 1


def test_windowed_counts_drop_late_events(spark, tmp_path):
    """Watermarked tumbling windows (A8 streaming analogue): an event
    arriving after the watermark passed its window is DROPPED; finalized
    windows emit exactly once in append mode."""
    import time as _time

    from medical_ocr_service_spark.streaming.pipeline import windowed_event_counts

    src = tmp_path / "events_stream"
    src.mkdir()
    b1 = spark.createDataFrame(
        [("2024-01-01 10:00:30", "click", 1.0),
         ("2024-01-01 10:05:00", "click", 2.0),
         ("2024-01-01 11:00:00", "view", 1.0)],  # advances watermark
        "ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b1.coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))

    def run_once():
        stream = (
            spark.readStream.schema("ts timestamp, event_type string, value double")
            .parquet(str(src / "f*"))
        )
        agg = windowed_event_counts(
            stream, window="10 minutes", watermark="10 minutes"
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", str(tmp_path / "win_out"))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: advances the watermark to 10:50 (11:00 - 10m)
    run_once()
    _time.sleep(0.2)
    b2 = spark.createDataFrame(
        [("2024-01-01 10:06:00", "click", 4.0),   # LATE: watermark is 10:50
         ("2024-01-01 11:05:00", "view", 1.0)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b2.coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))
    # batch 2: restarts from the checkpoint (watermark persisted), only f2
    run_once()
    out = spark.read.parquet(str(tmp_path / "win_out")).toPandas()
    clicks = out[out["event_type"] == "click"]
    # the 10:00-10:10 click window finalized with ONLY batch-1 events —
    # the late 10:06 event was dropped by the watermark
    assert len(clicks) == 1
    assert clicks.iloc[0]["n"] == 2
    assert clicks.iloc[0]["sum_value"] == 3.0


def test_colocated_checkpointed_run_and_resume(spark, loaded, tmp_path):
    """colocated=True produces the same results table as the default plan
    and stays resume-safe (media joins on the owner key doc_id, so media of
    already-done docs drops out instead of resurrecting spans)."""
    docs, media = loaded
    ck = CheckpointedExtraction(str(tmp_path / "out"))
    first_half = docs.filter(F.col("doc_id") < "doc00000150")
    m1 = ck.run(first_half, media, colocated=True)
    assert m1["docs_processed"] == 150
    m2 = ck.run(docs, media, colocated=True)
    assert m2["docs_processed"] == docs.count() - 150

    ref = CheckpointedExtraction(str(tmp_path / "ref"))
    ref.run(docs, media)
    cols = ["doc_id", "spans_json", "full_text", "requiere_revision"]
    a = ck.results(spark).select(cols)
    b = ref.results(spark).select(cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0

    with pytest.raises(ValueError, match="colocated"):
        ck.run(docs, media, colocated=True, quarantine=True)


def test_results_latest_wins_via_partial_max_no_window(spark, loaded, tmp_path):
    """results() dedup is a struct-max argmax, not a row_number window: the
    executed plan must carry a map-side partial_max and zero Window nodes
    (the read path of a 10^12-doc results table can't afford a per-doc
    sort), and the winner must equal the explicit (desc run_ts, desc
    run_id) window rule when a second overlapping run appends duplicates."""
    from pyspark.sql import Window

    docs, media = loaded
    ck = CheckpointedExtraction(str(tmp_path / "out"))
    ck.run(docs, media)

    # simulate the documented duplicate source: a second successful
    # non-resume run over an overlapping input slice (newer run_ts wins)
    first = spark.read.parquet(ck.results_path)
    dup = (
        first.filter(F.col("doc_id") < "doc00000020")
        .withColumn("run_ts", F.col("run_ts") + F.lit(1000.0))
        .withColumn("run_id", F.lit("zzzz_rerun"))
        .withColumn("full_text", F.concat(F.lit("RERUN::"), F.col("full_text")))
    )
    n_dup = dup.count()
    assert n_dup > 0
    dup.write.mode("append").parquet(ck.results_path)

    got = ck.results(spark)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_max" in plan, plan

    # exactly-once per doc, newer run's payload won
    assert got.count() == docs.count()
    assert (
        got.filter(F.col("full_text").startswith("RERUN::")).count() == n_dup
    )

    # bit-equality with the explicit window rule the docstring promises
    w = Window.partitionBy("doc_id").orderBy(F.desc("run_ts"), F.desc("run_id"))
    ref = (
        spark.read.parquet(ck.results_path)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0


def test_streaming_session_windows_merge_and_finalize(spark, tmp_path):
    """session_window streaming twin of temporal.sessionize: events within
    the gap merge into one session, a later event opens a new one, finalized
    sessions emit exactly once (append mode), and sessions still inside the
    watermark stay open. availableNow triggers a trailing no-data micro-batch
    with the advanced watermark, so finalization lands in the same run."""
    from medical_ocr_service_spark.streaming.pipeline import (
        sessionized_event_stats,
    )

    src = tmp_path / "sess_stream"
    src.mkdir()

    def write(name, rows):
        spark.createDataFrame(
            rows, "ts string, user_id long, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    def run_once():
        stream = (
            spark.readStream.schema("ts timestamp, user_id long, value double")
            .parquet(str(src / "f*"))
        )
        q = (
            sessionized_event_stats(stream, gap="30 minutes", watermark="30 minutes")
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "sess_out"))
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "sess_ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # b1: user 7 has two events 10' apart (merge) + one 80' later (new
    # session); user-9 sentinel at 12:00. Watermark after the run: 11:30 —
    # only user 7's first session (end 10:40) finalizes.
    write("f1", [("2024-01-01 10:00:00", 7, 1.0),
                 ("2024-01-01 10:10:00", 7, 2.0),
                 ("2024-01-01 11:30:00", 7, 4.0),
                 ("2024-01-01 12:00:00", 9, 0.5)])
    run_once()
    out = spark.read.parquet(str(tmp_path / "sess_out")).toPandas()
    assert len(out) == 1  # sessions ending 12:00 / 12:30 still open
    s1 = out.iloc[0]
    assert s1["user_id"] == 7 and s1["n_events"] == 2 and s1["sum_value"] == 3.0
    assert str(s1["session_start"]) == "2024-01-01 10:00:00"
    assert str(s1["session_end"]) == "2024-01-01 10:40:00"  # last ts + gap

    # b2: sentinel to 14:00 -> watermark 13:30 finalizes user-7 session 2
    # (end 12:00) and the 12:00 sentinel session; 14:00 itself stays open.
    write("f2", [("2024-01-01 14:00:00", 9, 0.5)])
    run_once()
    out = spark.read.parquet(str(tmp_path / "sess_out")).toPandas()
    u7 = out[out["user_id"] == 7].sort_values("session_start")
    assert len(u7) == 2  # session 1 emitted exactly once across runs
    assert u7.iloc[1]["n_events"] == 1
    assert str(u7.iloc[1]["session_end"]) == "2024-01-01 12:00:00"
    u9 = out[out["user_id"] == 9]
    assert len(u9) == 1 and str(u9.iloc[0]["session_end"]) == "2024-01-01 12:30:00"
