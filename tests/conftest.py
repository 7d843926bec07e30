"""Shared fixtures: one session-scoped SparkSession + a small synthetic corpus."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medical_ocr_service_spark import config  # noqa: E402
from medical_ocr_service_spark.corpus import generator, golden, write  # noqa: E402
from medical_ocr_service_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="pytest",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    """Materialized synthetic corpus (300 docs incl. one pathological) + golden."""
    out = str(tmp_path_factory.mktemp("corpus"))
    write.write_corpus(out, n_docs=300, seed=config.CORPUS_SEED)
    return out


@pytest.fixture(scope="session")
def corpus_mem():
    """In-memory corpus rows + golden results for unit-level tests."""
    docs, media = generator.synthesize_corpus(120, seed=config.CORPUS_SEED)
    results = golden.extract_corpus(docs, media)
    return docs, media, results


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA
