"""Large-scale deduplication operators (training-data pipeline suite).

All JVM-side DataFrame ops — no Python in the hot path:

  * exact_dedup          — sha256 content hash, keep-first representative
                           (reference's archivo_hash dedup,
                           /root/reference/src/services/feedback.service.js:28-58);
  * minhash_signatures / minhash_lsh_pairs — word-shingle MinHash + banded LSH
    candidate generation + exact Jaccard verification;
  * simhash_signatures / simhash_near_pairs — 64-bit SimHash + pigeonhole
    16-bit band blocking + hamming verification via bit_count(xor);
  * ngram_jaccard        — exact n-gram Jaccard for a pair table (verifier).

Scale notes (100 TB):
  * shingling/explode is narrow; the only shuffles are groupBy(doc) for
    signatures and groupBy(band_hash) for buckets — both map-side combined;
  * banded LSH turns the quadratic all-pairs problem into per-bucket
    micro-joins; bucket sizes are bounded by construction (hash of content);
  * signatures use F.hash(shingle, seed_i) — murmur3 with a literal salt
    column, deterministic across executors/runs/cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Exact dedup (F8/S9)
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct content hash; keeps min(id) as representative."""
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# Shingling
# ---------------------------------------------------------------------------

def word_shingles(text: Column, k: int = 5) -> Column:
    """Array of k-word shingles (distinct), lowercased, JVM-only."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = 64, shingle_k: int = 5
) -> DataFrame:
    """(id, shingles, sig: array<long> of n_hashes minima)."""
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), shingle_k).alias("shingles")
    )
    # min over shingles of murmur3(shingle, seed_i) for each hash function i —
    # computed with array higher-order functions (no explode: one pass per row).
    # NB: the transform lambda must be arity-1 — a 2-arg lambda would receive
    # the array INDEX as its second argument and shadow the seed.
    def _hash_fn(seed: int):
        return lambda s: F.hash(s, F.lit(seed)).cast("long")

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingles"), _hash_fn(i)))
            for i in range(n_hashes)
        ]
    )
    return sh.withColumn("sig", sig)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact shingle Jaccard >= threshold.

    Banded LSH: signature split into `bands` rows of n_hashes/bands values;
    docs sharing any band bucket become candidates; candidates are verified
    with exact Jaccard over the shingle arrays.
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k)

    banded = sigs.select(
        "id",
        "shingles",
        F.posexplode(
            F.array(
                *[
                    F.hash(
                        F.array_join(
                            F.transform(
                                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias(f"b{b}")
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )

    a = banded.select(
        F.col("band_idx").alias("bi"),
        F.col("band_hash").alias("bh"),
        F.col("id").alias("id_a"),
        F.col("shingles").alias("sh_a"),
    )
    b = banded.select(
        F.col("band_idx").alias("bi"),
        F.col("band_hash").alias("bh"),
        F.col("id").alias("id_b"),
        F.col("shingles").alias("sh_b"),
    )
    cand = (
        a.join(b, ["bi", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.withColumn(
            "jaccard",
            F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(0.0),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """64-bit SimHash over word tokens: bit b of the signature is 1 iff the
    sum over tokens of sign(bit b of murmur3x2(token)) is positive."""
    toks = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    # per-token 64-bit hash: two 32-bit murmur halves
    h64 = lambda t: (  # noqa: E731
        F.hash(t, F.lit(1)).cast("long") * F.lit(4294967296)
        + (F.hash(t, F.lit(2)).cast("long") + F.lit(2147483648))
    )
    exploded = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok")).withColumn(
        "h", h64(F.col("tok"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(64)
    ]
    agg = exploded.groupBy("id").agg(*bit_sums)
    sig = None
    for b in range(64):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(term, b)
        sig = term if sig is None else sig.bitwiseOR(term)
    return agg.select("id", sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Blocking: split the 64-bit signature into 4 x 16-bit chunks; by pigeonhole
    any pair within hamming 3 shares at least one exact chunk — join on
    (chunk_idx, chunk_value), then verify with bit_count(xor)."""
    sigs = simhash_signatures(df, text_col, id_col)
    chunks = sigs.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.select(
        F.col("chunk_idx").alias("ci"), F.col("chunk_val").alias("cv"),
        F.col("id").alias("id_a"), F.col("simhash").alias("sig_a"),
    )
    b = chunks.select(
        F.col("chunk_idx").alias("ci"), F.col("chunk_val").alias("cv"),
        F.col("id").alias("id_b"), F.col("simhash").alias("sig_b"),
    )
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (pair verifier / small-scale direct dedup)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, threshold: float = 0.5
) -> DataFrame:
    """All-pairs n-gram Jaccard (cross join — use only on bounded inputs or
    downstream of LSH blocking)."""
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), k).alias("sh")
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.withColumn(
            "jaccard",
            F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(0.0),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
