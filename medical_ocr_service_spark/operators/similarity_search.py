"""Similarity search over embedding columns (array<float>).

Two strategies, mirroring SURVEY J3/T1 at corpus scale:

  * brute-force cosine top-k — exact; JVM-only higher-order functions
    (zip_with/aggregate), one narrow pass + a top-k sort. The per-query
    baseline and the verifier for approximate methods.
  * random-hyperplane LSH buckets — deterministic hyperplanes derived from
    md5 (no RNG state), bucket join, exact re-rank within buckets. The
    10^12-row path: candidate generation is an equi-join on bucket id instead
    of a cross join.

Both keep every row JVM-side except hyperplane generation (driver-side numpy,
O(dim * n_planes)).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_col(a: Column, b: Column) -> Column:
    na, nb = F.sqrt(_dot(a, a)), F.sqrt(_dot(b, b))
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb)).otherwise(0.0)


def brute_force_topk(
    emb: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector (id tie-break)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = emb.select(
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col), q), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), id_col).limit(k)


def deterministic_hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Seed-free hyperplanes: entries derived from md5(plane,coord) — identical
    on every machine/run (N vs 4N determinism)."""
    H = np.empty((n_planes, dim))
    for p in range(n_planes):
        for d in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"{p}:{d}".encode()).digest()[:8], "big"
            )
            H[p, d] = (h / 2**63) - 1.0  # uniform-ish in [-1, 1)
    return H


def lsh_bucket_col(vec_col: Column, hyperplanes: np.ndarray) -> Column:
    """Sign-bit bucket id from random-hyperplane projections (JVM arithmetic:
    each projection is a zip_with/aggregate dot product with a literal array)."""
    bits = []
    for p in range(hyperplanes.shape[0]):
        plane = F.array(*[F.lit(float(v)) for v in hyperplanes[p]])
        bit = F.when(_dot(vec_col, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bits.append(F.shiftleft(bit, p))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: only rows in the query's hyperplane bucket are
    scored (single-probe). Scale path for per-query lookups."""
    dim = len(query_vec)
    H = deterministic_hyperplanes(dim, n_planes)
    qb = 0
    qv = np.asarray(query_vec)
    for p in range(n_planes):
        if float(H[p] @ qv) >= 0:
            qb |= 1 << p
    bucketed = emb.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), H))
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        bucketed.filter(F.col("_bucket") == qb)
        .select(F.col(id_col), F.round(cosine_col(F.col(vec_col), q), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def cosine_near_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
) -> DataFrame:
    """All near-duplicate pairs by cosine >= threshold: LSH-bucket equi-join
    for candidates, exact cosine verification. (Embedding near-dup dedup.)"""
    H = deterministic_hyperplanes_cached(emb, vec_col, n_planes)
    bucketed = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("_bucket", lsh_bucket_col(F.col("v"), H))
    a = bucketed.select(
        F.col("_bucket"), F.col("id").alias("id_a"), F.col("v").alias("v_a")
    )
    b = bucketed.select(
        F.col("_bucket"), F.col("id").alias("id_b"), F.col("v").alias("v_b")
    )
    return (
        a.join(b, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine_col(F.col("v_a"), F.col("v_b")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def deterministic_hyperplanes_cached(
    emb: DataFrame, vec_col: str, n_planes: int
) -> np.ndarray:
    dim = len(emb.select(vec_col).first()[0])
    return deterministic_hyperplanes(dim, n_planes)
