"""doc_id-bucketed corpus tables: the co-location substrate for 100 TB runs.

At 10^12-document scale the groupBy(doc_id) reassembly exchange is the
extraction pipeline's dominant data movement (every cleaned span byte crosses
the network once). Iceberg removes it with a `bucket(N, doc_id)` partition
transform on BOTH the documents and media tables; Spark's native equivalent —
what this module materializes — is `bucketBy(N, "doc_id")` catalog tables,
which make the scan report HashPartitioning(doc_id, N) so Catalyst drops
every exchange from the co-located plan (extract.reassembled_docs_colocated;
tests/test_extraction.py asserts the executed plan contains no Exchange).

Bucket-count guidance at scale: pick N so one bucket of the LARGER table is
a few GB (10^12 docs * ~1 KB => N ~ 2^18); both tables MUST share N and the
key, or the join side with the differing spec is shuffled back in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_corpus(
    docs: DataFrame,
    media: DataFrame,
    n_buckets: int,
    database: str = "colocated",
    location: str | None = None,
) -> tuple[str, str]:
    """Materialize docs + media as doc_id-bucketed catalog tables.

    Returns the two qualified table names. `location` pins the database
    directory (tests point it at a tmpdir; default is the session warehouse).
    sortBy(doc_id) additionally persists per-bucket order so the sort-merge
    join's partition-local sorts can be satisfied from file order when each
    bucket lands in a single file.
    """
    spark = docs.sparkSession
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")
    names = (f"{database}.documents_interleaved", f"{database}.media")
    for df, name in ((docs, names[0]), (media, names[1])):
        (
            df.write.bucketBy(n_buckets, "doc_id")
            .sortBy("doc_id")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(name)
        )
    return names


def read_bucketed_corpus(
    spark: SparkSession, database: str = "colocated"
) -> tuple[DataFrame, DataFrame]:
    """The bucketed tables back as DataFrames (scan carries the bucket spec)."""
    return (
        spark.table(f"{database}.documents_interleaved"),
        spark.table(f"{database}.media"),
    )
