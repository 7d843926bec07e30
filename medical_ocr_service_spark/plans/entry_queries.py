"""Registry of driver-checked queries + DuckDB oracle SQL twins.

Each QUERIES[name] is (spark, sf_dir) -> DataFrame; ORACLES[name] is the
equivalent ANSI SQL DuckDB runs on the same parquet (views: region nation
customer supplier part orders lineitem events documents embeddings).
Column names/aliases MUST match between the two — the driver hash-compares
values after sorting columns by name.

Populated operator-by-operator as SURVEY.md §2 coverage grows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
