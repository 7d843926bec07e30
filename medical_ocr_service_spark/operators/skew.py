"""Skew-safe aggregation: explicit two-stage salted group-by.

At 100 TB a handful of head keys (a viral document source, one dominant
event_type, the empty-string language tag) can hold 10-30% of all rows;
a plain groupBy shuffles every row of a hot key to ONE reducer, and that
straggler sets the stage's wall clock. AQE's skew handling only splits
skewed JOIN partitions — a skewed AGGREGATE still funnels each key into a
single task after the map-side combine (which helps only when the map
partition count x distinct-values-per-partition stays small).

``salted_group_agg`` makes the classic fix explicit and reusable:

  stage 1: group by (key, salt) where salt = hash(row-unique column) mod S
           — the hot key's rows spread over S reducers, each computing a
           partial (count, decimal-sum);
  stage 2: group by key over the S partials — S rows per key, trivially
           cheap, whatever the skew.

The salt derives from xxhash64 of a row-unique column (deterministic — no
rand(), so retried/recomputed tasks salt identically and the result is
replay-stable), and sums ride DECIMAL(38,6) so the two-stage reassociation
is EXACT — bit-identical to the single-stage plan, which is what lets a
plain GROUP BY serve as the correctness oracle.

Reference parity: the reference service aggregates at Postgres scale and
never needs this; it belongs to the 100 TB training-data-pipeline operator
set (per-source/per-shard corpus census over skewed provenance keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_group_agg(
    df: DataFrame,
    key_col: str,
    value_col: str,
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Count + exact sum of ``value_col`` per ``key_col``, salted over
    ``n_salts`` partial groups keyed on hash(``salt_from``).

    Output: (key_col, n_rows, total_value) with total_value a ROUND(.,4)
    double of the exact DECIMAL(38,6) sum — identical to the unsalted
    single-stage aggregate, row for row and bit for bit.
    """
    salted = df.select(
        F.col(key_col),
        F.col(value_col).cast("decimal(38,6)").alias("_v"),
        F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts)).alias("_salt"),
    )
    partial = salted.groupBy(key_col, "_salt").agg(
        F.count("*").alias("_n"), F.sum("_v").alias("_s")
    )
    return partial.groupBy(key_col).agg(
        F.sum("_n").alias("n_rows"),
        # round in DECIMAL space BEFORE the double cast: a scale-6 sum's
        # scaled integer can exceed 2^53, where engines' decimal->double
        # conversions may differ by 1 ulp; at scale 4 both are exact.
        F.round(F.sum("_s"), 4).cast("double").alias("total_value"),
    )
