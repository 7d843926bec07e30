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
import pandas as pd
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


LSH_QUANT = 4096  # power of two: x*4096 and floor() are EXACT in IEEE


def srp_coefficients(dim: int, n_planes: int) -> list[list[int]]:
    """Seed-free signed-random-projection hyperplanes with small INTEGER
    coefficients in [-8, 8], derived from md5(plane:coord).

    Integer coefficients (instead of floats) + power-of-two quantization of
    the vector make the whole bucket computation exact integer arithmetic —
    identical on every machine, run, cluster size, AND in DuckDB SQL, so
    the driver oracle can replay buckets bit-for-bit. Float dot products
    would be accumulation-order-dependent at the sign boundary."""
    H: list[list[int]] = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int.from_bytes(hashlib.md5(f"srp:{p}:{d}".encode()).digest()[:8], "big")
            row.append((h % 17) - 8)
        H.append(row)
    return H


def quantized_vec(vec_col: Column) -> Column:
    """floor(x * 4096) per component as long — exact for float32 inputs
    (power-of-two scale shifts the exponent only)."""
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * F.lit(LSH_QUANT)).cast("long")
    )


def lsh_bucket_col(vec_col: Column, coefs: list[list[int]]) -> Column:
    """Sign-bit bucket id from integer SRP projections (pure BIGINT math)."""
    qv = quantized_vec(vec_col)
    bits = []
    for p, row in enumerate(coefs):
        plane = F.array(*[F.lit(int(c)).cast("long") for c in row])
        proj = F.aggregate(
            F.zip_with(qv, plane, lambda x, c: x * c),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bits.append(F.shiftleft(bit, p))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def srp_bucket_py(vec: list[float], coefs: list[list[int]]) -> int:
    """Driver-side twin of lsh_bucket_col for a literal query vector."""
    import math

    q = [math.floor(float(x) * LSH_QUANT) for x in vec]
    b = 0
    for p, row in enumerate(coefs):
        if sum(x * c for x, c in zip(q, row)) >= 0:
            b |= 1 << p
    return b


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
    H = srp_coefficients(dim, n_planes)
    qb = srp_bucket_py(query_vec, H)
    bucketed = emb.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), H))
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        bucketed.filter(F.col("_bucket") == qb)
        .select(F.col(id_col), F.round(cosine_col(F.col(vec_col), q), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def _assign_udf(centroids: np.ndarray):
    """Vectorized cluster assignment: argmax cosine against the (broadcast)
    centroid matrix — one numpy matmul per Arrow batch, no per-row Python."""
    C = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        V = np.stack(vecs.to_numpy())
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(V @ C.T, axis=1).astype("int32"))

    return assign


def ivf_build(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_list: int = 16,
    n_iters: int = 2,
) -> tuple[DataFrame, np.ndarray]:
    """IVF coarse quantizer (the pgvector-IVFFlat analogue — SURVEY D12,
    embedding.worker.js:154-190 — re-expressed distributed + deterministic).

    Deterministic k-means: initial centroids are the ``n_list`` rows with the
    smallest md5(id) (seed-free, machine-independent), followed by a FIXED
    number of Lloyd iterations. Assignment is a vectorized pandas-UDF matmul;
    the centroid update is a distributed per-dimension mean
    (posexplode -> groupBy(cluster, pos) avg), only n_list*dim scalars ever
    reach the driver. Returns (emb + ``_ivf_cluster`` column, centroids)."""
    seeds = (
        emb.select(vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_list)
        .collect()
    )
    C = np.array([r[0] for r in seeds], dtype="float64")
    for _ in range(n_iters):
        assigned = emb.withColumn("_ivf_cluster", _assign_udf(C)(F.col(vec_col)))
        means = (
            assigned.select("_ivf_cluster", F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("_ivf_cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        for r in means:
            C[r["_ivf_cluster"], r["pos"]] = r["m"]
    return emb.withColumn("_ivf_cluster", _assign_udf(C)(F.col(vec_col))), C


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_list: int = 16,
    n_probe: int = 4,
    n_iters: int = 2,
) -> DataFrame:
    """Approximate top-k via IVF: probe the ``n_probe`` centroids nearest the
    query, score only their inverted lists exactly (JVM cosine), top-k with id
    tie-break. The 10^12-row scale path: candidate generation is a partition-
    prunable equi-filter on cluster id instead of a full scan. At scale the
    assigned table is written partitioned by ``_ivf_cluster`` so the probe
    filter prunes files; here it prunes rows."""
    assigned, C = ivf_build(emb, id_col, vec_col, n_list, n_iters)
    q = np.asarray(query_vec, dtype="float64")
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = [int(c) for c in np.argsort(-(Cn @ qn))[:n_probe]]
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        assigned.filter(F.col("_ivf_cluster").isin(probes))
        .select(
            F.col(id_col),
            F.round(cosine_col(F.col(vec_col), qcol), 6).alias("cos_sim"),
        )
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
    for candidates (ids ONLY through the shuffle — vectors re-attach to the
    deduped candidate list via two slim joins), exact cosine verification."""
    dim = len(emb.select(vec_col).first()[0])
    H = srp_coefficients(dim, n_planes)
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    bucketed = base.select(
        "id", lsh_bucket_col(F.col("v"), H).alias("_bucket")
    )
    a = bucketed.select(F.col("_bucket"), F.col("id").alias("id_a"))
    b = bucketed.select(F.col("_bucket"), F.col("id").alias("id_b"))
    cand = (
        a.join(b, "_bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.join(base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a")), "id_a")
        .join(base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b")), "id_b")
        .withColumn("cos_sim", F.round(cosine_col(F.col("v_a"), F.col("v_b")), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def quantize_int8_col(vec: Column) -> Column:
    """Symmetric int8 quantization of a float vector: q_i = rhu(x_i * 127 /
    max|x|) with rhu = floor(.+0.5) (round-half-up — floor is exact IEEE on
    both engines, unlike round()'s HALF_UP-vs-banker divergence). Vectors
    with max|x| == 0 map to NULL (callers filter)."""
    dv = F.transform(vec, lambda x: x.cast("double"))
    amax = F.array_max(F.transform(dv, F.abs))
    return F.when(
        amax > 0.0,
        F.transform(dv, lambda x: F.floor(x * 127.0 / amax + 0.5)),
    )


def quantized_ann_topk(
    emb: DataFrame,
    query_id,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    passthrough: tuple[str, ...] = ("label",),
) -> DataFrame:
    """Top-k neighbours by INT8-quantized dot product — the memory-scale ANN
    variant: at 10^12 vectors the float corpus doesn't fit executor RAM, so
    the scan ranks on 4x-smaller int8 codes (symmetric quantization) and
    only the k survivors are re-ranked in float upstream. The integer dot
    product (<= 64 * 127^2 < 2^20 per pair) is exact in both engines — the
    score is a BIGINT, so the driver hash can never wobble on a ulp.

    Plan: quantize is a narrow projection; the single query row broadcasts;
    the scan is one pass + TakeOrdered(k) — no shuffle of the corpus.

    ``passthrough`` columns ride into the output when present (missing
    ones are skipped, so the default ("label",) doesn't break frames
    without that column)."""
    keep = [c for c in passthrough if c in emb.columns]
    base = emb.select(
        F.col(id_col),
        *keep,
        quantize_int8_col(F.col(vec_col)).alias("qv"),
    ).filter(F.col("qv").isNotNull())
    q = base.filter(F.col(id_col) == query_id).select(
        F.col("qv").alias("query_q")
    )
    qdot = F.aggregate(
        F.zip_with("qv", "query_q", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        base.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), *keep, qdot.alias("qdot"))
        .orderBy(F.desc("qdot"), id_col)
        .limit(k)
    )


def label_centroids(
    emb: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label mean embedding: (label, centroid array<double>).

    Plan: posexplode is narrow; the groupBy(label, pos) shuffle carries
    (label, pos, partial-sum) only and map-side combines down to
    labels x dims rows — at 10^12 vectors the exchange is centroid-sized,
    not corpus-sized. The array rebuild sorts on pos (collect_list order is
    shuffle-dependent; never rely on it)."""
    ex = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    cent = ex.groupBy("label", "pos").agg(
        F.avg(F.col("val").cast("double")).alias("c")
    )
    return cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))),
            lambda s: s["c"],
        ).alias("centroid")
    )


def centroid_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    bottom_k: int = 5,
) -> DataFrame:
    """Embedding-based data-quality pass: the ``bottom_k`` vectors per label
    by cosine similarity to their OWN label centroid — mislabeled or
    off-distribution examples surface at the bottom of the ranking (the
    standard embedding-outlier filter in training-data curation).

    Plan: centroids are labels x dims (tiny) -> BROADCAST equi-join back on
    label; the cosine is a JVM higher-order fold (no Python); the per-label
    bottom-k is one window over the label partitioning. The corpus shuffles
    once, on label, for the window. Zero-norm vectors are excluded up front
    (cosine undefined; both engines would otherwise coin-flip a 0.0 rank)."""
    norm = F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    base = emb.filter(norm > 0.0)
    cents = label_centroids(base, vec_col, label_col)
    scored = base.join(
        F.broadcast(cents), base[label_col] == cents["label"]
    ).select(
        F.col(id_col),
        base[label_col].alias(label_col),
        F.round(cosine_col(F.col(vec_col), F.col("centroid")), 6).alias(
            "cos_centroid"
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(label_col).orderBy(
        F.asc("cos_centroid"), F.asc(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= bottom_k)
        .select(id_col, label_col, "cos_centroid", "rnk")
    )
