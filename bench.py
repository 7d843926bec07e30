#!/usr/bin/env python
"""Benchmark runner: headline queries at sf0.1 + extraction throughput +
N->4N parallelism scaling evidence.

Prints ONE JSON line:
  {"metric": "...", "value": <total headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "extraction": {"docs": N, "docs_per_sec_N": ..., "docs_per_sec_4N": ...,
                   "scaling_efficiency": ...},
   ...}

Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     high parallelism level "4N" (default 32; N = cpus/4)
  SPARK_GRAFT_BENCH_SCALING  "0" to skip the low-parallelism run
  SPARK_GRAFT_BENCH_DOCS     extraction corpus size (default 4000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "300000"))
N_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
DO_SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"

HEADLINE = [
    "q1_pricing_summary",
    "a7_daily_breakdown",
    "t3_latest_argmax",
    "j8_detail_enrichment_3way",
    "j11_training_antijoin",
    "ann_cosine_topk",
    "f8_content_hash_dedup",
]


def _sf_value(path: str) -> float:
    import re

    m = re.search(r"sf([\d.]+)", path)
    return float(m.group(1)) if m else -1.0


def _corpus_parquet(tmp: str) -> tuple[str, str]:
    """Materialize the interleaved bench corpus once (not timed)."""
    from medical_ocr_service_spark.corpus import write as cwrite

    # v2: bounded row groups (scan parallelism) — key the cache by format
    out = os.path.join(tmp, f"bench_corpus_v2_{N_DOCS}")
    if not os.path.exists(os.path.join(out, "documents_interleaved.parquet")):
        cwrite.write_corpus(out, n_docs=N_DOCS, with_golden=False)
    return (
        os.path.join(out, "documents_interleaved.parquet"),
        os.path.join(out, "media.parquet"),
    )


def _run_extraction(master_cores: int, docs_path: str, media_path: str) -> dict:
    from medical_ocr_service_spark.operators import extract
    from medical_ocr_service_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-extract-{master_cores}",
        master=f"local[{master_cores}]",
        shuffle_partitions=master_cores,
        extra_conf={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m"},
    )
    try:
        # No explicit repartition: bounded parquet row groups + 16m split
        # size give scan parallelism, and the groupBy(doc_id) exchange does
        # the hash partitioning (north_rule) where it is actually needed.
        docs = spark.read.parquet(docs_path)
        media = spark.read.parquet(media_path)
        # warm-up: spin up every Python worker + JVM codegen before timing
        extract.extract_documents(docs.limit(max(2000, N_DOCS // 10)), media).write.format(
            "noop"
        ).mode("overwrite").save()
        n = docs.count()
        # median of N_REPS timed runs: the sandbox host shows CPU steal, so a
        # single sample can be off by 2-4x
        times = []
        for _ in range(N_REPS):
            t0 = time.perf_counter()
            extract.extract_documents(docs, media).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
        times.sort()
        # min-of-reps: the sandbox host shows CPU steal; the minimum is the
        # machine-capability estimator (standard bench practice under noise)
        dt = times[0]
        return {"cores": master_cores, "docs": n, "sec": round(dt, 3),
                "docs_per_sec": round(n / dt, 2), "all_secs": [round(t, 2) for t in times]}
    finally:
        spark.stop()


def _run_headline(sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry_mod
    from medical_ocr_service_spark.session import get_spark

    spark = get_spark(app_name="bench-queries", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    try:
        qs = entry_mod.queries()
        for name in HEADLINE:
            fn = qs[name]
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
    finally:
        spark.stop()
    return timings


def main() -> None:
    tmp = os.environ.get("TMPDIR", "/tmp")

    result: dict = {
        "metric": "headline query latency (sf0.1) + interleaved-docs extraction throughput",
        "unit": "sec",
        "sf": _sf_value(SF_DIR),
    }

    try:
        docs_path, media_path = _corpus_parquet(tmp)
        timings = _run_headline(SF_DIR)
    except Exception as exc:  # always emit the JSON line for the driver
        result.update({"queries": {}, "value": -1.0, "error": repr(exc)})
        print(json.dumps(result))
        return
    result["queries"] = timings
    result["value"] = round(sum(timings.values()), 3)

    try:
        lo = None
        if DO_SCALING:
            lo = _run_extraction(max(2, CPUS // 4), docs_path, media_path)
        hi = _run_extraction(CPUS, docs_path, media_path)
    except Exception as exc:
        result.update({"extraction": {"error": repr(exc)}})
        print(json.dumps(result))
        return
    extraction = {
        "docs": hi["docs"],
        "cores_4N": hi["cores"],
        "sec_4N": hi["sec"],
        "docs_per_sec_4N": hi["docs_per_sec"],
    }
    if lo is not None:
        extraction.update(
            {
                "cores_N": lo["cores"],
                "sec_N": lo["sec"],
                "docs_per_sec_N": lo["docs_per_sec"],
                # efficiency of scaling N -> 4N cores
                "scaling_efficiency": round(
                    (hi["docs_per_sec"] / lo["docs_per_sec"]) / (hi["cores"] / lo["cores"]),
                    3,
                ),
            }
        )
    result["extraction"] = extraction

    print(json.dumps(result))


if __name__ == "__main__":
    main()
