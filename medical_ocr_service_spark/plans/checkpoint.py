"""Checkpointed, resumable extraction runs (north_rule: resumability).

The reference recovers a crashed queue by flipping PROCESSING->QUEUED rows and
re-reading QUEUED from Postgres (/root/reference/src/services/job-queue.service.js:127-162).
Spark-first equivalent: the *output table is the checkpoint*. Pending work =
anti-join of the input docs against the doc_ids already present in the output
snapshot; a resumed run recomputes only unprocessed documents, and a MERGE
(or append + dedup-on-read here, with Iceberg MERGE INTO in production) keeps
exactly-once per doc_id.

Per-partition lineage + counters (Q5): every run writes a _lineage/<run_id>.json
with observed metrics (docs processed, spans emitted, parse failures) captured
via df.observe() — the Spark analogue of the reference's per-batch counters
(job-queue.service.js:88-117).

At 10^12-doc scale the anti-join is a shuffle-free pushdown when the output is
partitioned by the same doc_id hash-bucket as the input (bucket-join); here we
rely on AQE planning over parquet.

Two storage substrates (constructor flag):
  * snapshots=False — plain parquet appends, exactly-once restored by
    dedup-on-read in results();
  * snapshots=True  — SnapshotTable (sources/snapshot_table.py): every run is
    one atomic snapshot commit carrying its lineage counters in the manifest
    summary; a crashed run commits nothing, resume is re-derived from the last
    snapshot, and results(snapshot_id=...) time-travels. This is the
    Iceberg-shaped path the north_rule names.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..operators import extract


class CheckpointedExtraction:
    """Exactly-once-per-doc extraction with anti-join resume.

    ``snapshots=True`` stores results + quarantine in SnapshotTable
    (sources/snapshot_table.py) — atomic snapshot commits with the run's
    lineage counters embedded in the manifest summary, crash-safe resume
    (an uncommitted run is INVISIBLE to done_doc_ids, unlike raw parquet
    appends under commit algorithm v2), and time travel via
    ``results(snapshot_id=...)``. Default False keeps the plain
    parquet-append layout (dedup-on-read)."""

    def __init__(self, output_path: str, snapshots: bool = False):
        from ..sources.snapshot_table import SnapshotTable

        self.output_path = output_path
        self.results_path = os.path.join(output_path, "results")
        self.lineage_path = os.path.join(output_path, "_lineage")
        self.quarantine_path = os.path.join(output_path, "_quarantine")
        self.snapshots = snapshots
        self._results_tab = SnapshotTable(self.results_path) if snapshots else None
        self._quar_tab = SnapshotTable(self.quarantine_path) if snapshots else None

    # -- state -------------------------------------------------------------

    def _read_results(
        self, spark: SparkSession, snapshot_id: int | None = None
    ) -> DataFrame | None:
        if self.snapshots:
            return self._results_tab.read(spark, snapshot_id)
        try:
            return spark.read.parquet(self.results_path)
        except Exception:
            return None  # no snapshot yet

    def done_doc_ids(
        self, spark: SparkSession, snapshot_id: int | None = None
    ) -> DataFrame | None:
        df = self._read_results(spark, snapshot_id)
        return None if df is None else df.select("doc_id").distinct()

    def pending(self, docs: DataFrame, snapshot_id: int | None = None) -> DataFrame:
        done = self.done_doc_ids(docs.sparkSession, snapshot_id)
        if done is None:
            return docs
        return docs.join(done, "doc_id", "left_anti")

    def quarantine_attempts(self, spark: SparkSession) -> DataFrame | None:
        """(doc_id, intentos) from prior runs' quarantine appends."""
        if self.snapshots:
            q = self._quar_tab.read(spark)
            if q is None:
                return None
        else:
            try:
                q = spark.read.parquet(self.quarantine_path)
            except Exception:
                return None
        return q.groupBy("doc_id").agg(
            F.countDistinct("run_id").alias("intentos")
        )

    def failed_docs(self, spark: SparkSession, max_intentos: int = 3) -> DataFrame:
        """Quarantine rollup (Q3, job-queue.service.js:193-238): per doc,
        attempt count and state — FAILED once max_intentos is exhausted,
        QUEUED (retry on next resume) below it. Quarantine appends are never
        rewritten, so docs that later SUCCEEDED are reconciled here: the
        rollup anti-joins the results snapshot, dropping recovered docs from
        the report."""
        att = self.quarantine_attempts(spark)
        if att is None:
            return spark.createDataFrame([], "doc_id string, intentos long, estado string")
        done = self.done_doc_ids(spark)
        if done is not None:
            att = att.join(done, "doc_id", "left_anti")
        return att.withColumn(
            "estado",
            F.when(F.col("intentos") >= max_intentos, "FAILED").otherwise("QUEUED"),
        )

    def snapshot_log(self) -> list[dict]:
        """Commit history of the results table (snapshots=True only):
        one entry per run with its embedded lineage counters."""
        if not self.snapshots:
            raise ValueError("snapshot_log() requires snapshots=True")
        return self._results_tab.history()

    # -- run ---------------------------------------------------------------

    def run(
        self,
        docs: DataFrame,
        media: DataFrame,
        fail_on: str | None = None,
        media_strategy: str = "join",
        salted: bool = False,
        quarantine: bool = False,
        max_intentos: int = 3,
        colocated: bool = False,
    ) -> dict:
        """Process pending docs, append results, write lineage. Returns the
        lineage record. `fail_on` (doc_id) injects a mid-run failure for
        crash-recovery tests. ``media_strategy`` as in extract.clean_spans;
        "denormalized" is refused on a RESUME — the pending filter applies
        to docs only, so unfiltered media rows would resurrect spans of
        already-done documents.

        ``quarantine=True`` (Q3): per-row failure isolation — documents with
        an unparsable span are withheld from results and appended to the
        quarantine table instead of failing the task; each resumed run
        retries them (attempt = distinct run_id in quarantine) until
        ``max_intentos``, after which they are excluded permanently
        (failed_docs() reports estado FAILED).

        ``colocated=True`` swaps in the zero-exchange co-located plan
        (extract.extract_documents_colocated) — intended for doc_id-bucketed
        inputs where it runs shuffle-free; resume-safe because media joins
        on the owner key doc_id. Mutually exclusive with salted/quarantine
        (those belong to the groupBy reassembly path)."""
        spark = docs.sparkSession
        run_id = uuid.uuid4().hex[:12]
        run_ts = time.time()
        # Pin the base snapshot: pending is DERIVED from this read, so the
        # append commit passes it as the CAS base — a concurrent commit
        # between the read and the install raises CommitConflict instead of
        # double-processing docs that writer already completed.
        base_sid = (
            self._results_tab.current_snapshot_id() if self.snapshots else None
        )
        if (
            media_strategy == "denormalized"
            and self.done_doc_ids(spark, base_sid) is not None
        ):
            raise ValueError(
                "media_strategy='denormalized' is unsafe when resuming from an "
                "existing snapshot (media rows of already-done docs would "
                "reappear); use 'join' or 'broadcast'"
            )
        if colocated and (salted or quarantine):
            raise ValueError(
                "colocated=True is the shuffle-free alternative plan; "
                "salted/quarantine apply to the groupBy reassembly path only"
            )
        pending = self.pending(docs, base_sid)

        quarantine_df = None
        if colocated:
            result = extract.extract_documents_colocated(pending, media)
        elif quarantine:
            if salted:
                raise ValueError(
                    "quarantine=True has no salted reassembly path; drop "
                    "salted=True or run without per-row quarantine"
                )
            att = self.quarantine_attempts(spark)
            if att is not None:
                exhausted = att.filter(F.col("intentos") >= max_intentos).select(
                    "doc_id"
                )
                pending = pending.join(
                    F.broadcast(exhausted), "doc_id", "left_anti"
                )
            result, quarantine_df = extract.extract_documents_quarantine(
                pending, media, media_strategy=media_strategy
            )
        else:
            result = extract.extract_documents(
                pending, media, media_strategy=media_strategy, salted=salted
            )
        if fail_on is not None:
            # deterministic poison row -> task failure after partial work
            result = result.withColumn(
                "doc_id",
                F.when(
                    F.col("doc_id") == fail_on,
                    F.raise_error(F.lit(f"injected failure at {fail_on}")),
                ).otherwise(F.col("doc_id")),
            )

        obs = Observation(f"lineage_{run_id}")
        observed = result.observe(
            obs,
            F.count(F.lit(1)).alias("docs_processed"),
            F.sum(F.size("spans")).alias("spans_emitted"),
            F.sum(
                F.when(F.col("fields.paciente_ci").isNull(), 1).otherwise(0)
            ).alias("docs_missing_ci"),
            F.sum(F.when(F.size("fields.practicas") == 0, 1).otherwise(0)).alias(
                "docs_no_practicas"
            ),
            F.sum(F.when(F.col("requiere_revision"), 1).otherwise(0)).alias(
                "docs_review"
            ),
        )

        flat = observed.select(
            "doc_id",
            F.col("spans").cast("string").alias("spans_json"),
            "full_text",
            "fields.*",
            "requiere_revision",
            F.lit(run_id).alias("run_id"),
            F.lit(run_ts).alias("run_ts"),
        )
        if self.snapshots:
            # the commit point: lineage counters land INSIDE the snapshot
            # manifest (summary is evaluated after the data-write action, so
            # the Observation is populated); a crash before the version-hint
            # rename leaves the table at the parent snapshot.
            snapshot_id = self._results_tab.commit_append(
                flat,
                summary=lambda: {
                    **{k: str(v) for k, v in obs.get.items()},
                    "run_id": run_id,
                },
                base_sid=base_sid,
            )
        else:
            flat.write.mode("append").parquet(self.results_path)
            snapshot_id = None

        n_quarantined = 0
        if quarantine_df is not None:
            qrows = quarantine_df.withColumn("run_id", F.lit(run_id)).withColumn(
                "run_ts", F.lit(run_ts)
            )
            if self.snapshots:
                self._quar_tab.commit_append(qrows, summary={"run_id": run_id})
                qall = self._quar_tab.read(spark)
            else:
                qrows.write.mode("append").parquet(self.quarantine_path)
                qall = spark.read.parquet(self.quarantine_path)
            n_quarantined = (
                qall.filter(F.col("run_id") == run_id)
                .select("doc_id")
                .distinct()
                .count()
            )

        metrics = dict(obs.get)
        if snapshot_id is not None:
            metrics["snapshot_id"] = snapshot_id
        if quarantine:
            metrics["docs_quarantined"] = n_quarantined
        metrics.update(
            {
                "run_id": run_id,
                "ts": time.time(),
                "output": self.results_path,
            }
        )
        os.makedirs(self.lineage_path, exist_ok=True)
        with open(os.path.join(self.lineage_path, f"{run_id}.json"), "w") as f:
            json.dump(metrics, f, default=str)
        return metrics

    def results(
        self, spark: SparkSession, snapshot_id: int | None = None
    ) -> DataFrame:
        """Snapshot read with exactly-once semantics: if a crashed run left
        partial/duplicate appends, keep one row per doc_id (latest run wins —
        the read-side equivalent of Iceberg MERGE). With snapshots=True,
        ``snapshot_id`` time-travels to any committed snapshot; the dedup
        dedup stays as defense-in-depth (duplicates can still arise from
        two successful non-resume runs over overlapping inputs)."""
        df = self._read_results(spark, snapshot_id)
        if df is None:
            raise FileNotFoundError(f"no committed results under {self.results_path}")
        # recency = the run's start timestamp (monotonic across runs), with
        # run_id as a deterministic tie-break — ordering by the random uuid
        # alone would make "latest wins" a coin flip between runs.
        # struct-max argmax instead of a row_number window: max over
        # (run_ts, run_id, row) equals the window's (desc run_ts, desc
        # run_id) winner (struct NULL-smallest matches DESC NULLS LAST),
        # but aggregates with a map-side partial_max — one surviving row
        # per (partition, doc) crosses the shuffle and there's no per-doc
        # sort, which is what a 10^12-doc results table needs on read.
        other = [c for c in df.columns if c != "doc_id"]
        best = (
            df.groupBy("doc_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("run_ts"),
                        F.col("run_id"),
                        F.struct(*other).alias("_row"),
                    )
                ).alias("_b")
            )
            .select("doc_id", "_b._row.*")
        )
        return best.select(*df.columns)
