"""Partial-update upsert (SURVEY S8/S9) as a reusable DataFrame MERGE.

Reference semantics (/root/reference/src/routes/v1/data-ingest.routes.js:125-160):
UPDATE existing rows column-by-column with COALESCE(new, old); INSERT rows
whose key is absent. Surrogate ids for inserts come from a deterministic hash
of the business key — NOT the reference's MAX(id)+1 (a serial bottleneck and
a race at scale).

In production this is Iceberg `MERGE INTO t USING s ON ... WHEN MATCHED THEN
UPDATE SET c = coalesce(s.c, t.c) WHEN NOT MATCHED THEN INSERT ...`; this
DataFrame expression computes the identical result table for parquet targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coalesce_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    surrogate_id: str | None = None,
) -> DataFrame:
    """Return the merged table: all target columns; source non-null values win
    on matched keys; unmatched source rows are inserted.

    `surrogate_id`: name of an id column to fill for inserted rows with a
    deterministic 63-bit hash of the key columns (stable across runs and
    cluster sizes)."""
    t_cols = target.columns
    s_cols = set(source.columns)
    t = target.alias("t")
    s = source.alias("s")
    cond = None
    for k in keys:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else (cond & c)
    joined = t.join(s, cond, "full_outer")

    out = []
    for c in t_cols:
        tc = F.col(f"t.{c}")
        if c in keys:
            expr = F.coalesce(tc, F.col(f"s.{c}"))
        elif c == surrogate_id and c not in s_cols:
            expr = F.coalesce(
                tc,
                F.abs(F.xxhash64(*[F.col(f"s.{k}") for k in keys])),
            )
        elif c in s_cols:
            expr = F.coalesce(F.col(f"s.{c}"), tc)
        else:
            expr = tc
        out.append(expr.alias(c))
    return joined.select(*out)


def idempotent_result_sink(
    existing: DataFrame | None, incoming: DataFrame, hash_col: str
) -> DataFrame:
    """S9 (feedback.service.js:28-58): INSERT ... ON CONFLICT(hash) DO UPDATE —
    incoming wins per content hash, one row per hash."""
    inc = incoming.dropDuplicates([hash_col])
    if existing is None:
        return inc
    keep = existing.join(inc.select(hash_col), hash_col, "left_anti")
    return keep.unionByName(inc)
