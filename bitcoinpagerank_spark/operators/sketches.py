"""Distinct-count sketching (KMV / k-minimum-values).

Not in the reference (training-data-pipeline op: "how many distinct
urls/tokens/ngrams does this 100 TB corpus hold" without a full distinct
shuffle). The KMV estimator (Bar-Yossef et al.): hash every value with a
fixed LCG into [0, P), keep the k smallest distinct hashes — a bounded
TakeOrderedAndProject, no full-width shuffle — and estimate
d ≈ (k-1)·P / h_(k). Deterministic by construction (same LCG both
engines), so unlike HLL it is exactly DuckDB-oracle-able; accuracy is the
standard ~1/sqrt(k) relative error.

Spark's own approx_count_distinct (HLL++) remains the zero-thought
built-in; this operator exists for engine parity (a sketch whose value is
reproducible across engines and runs — required when dedup decisions are
audited) and as the mergeable-sketch surface (the k minima of a union are
the k minima of the merged minima sets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import HASH_P

# fixed LCG (same family as dedup.minhash_coeffs, index 0)
KMV_A = 1_664_525
KMV_B = 1_013_904_223


def kmv_hash(col: Column) -> Column:
    """LCG hash of an integral column into [0, P)."""
    return (col.cast("long") * F.lit(KMV_A) + F.lit(KMV_B)) % F.lit(HASH_P)


def kmv_distinct(
    values: DataFrame, col: str = "value", k: int = 256
) -> DataFrame:
    """One row (n_hashes, kth_min, est_distinct) estimating the number of
    distinct values of ``values[col]`` (an integral column).

    When fewer than k distinct hashes exist the sketch IS the distinct
    set and the estimate is exact (= n_hashes). Rounded to 6 places for
    cross-engine hashing.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    minima = (
        values.select(kmv_hash(F.col(col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    return minima.agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("h").alias("kth_min"),
    ).select(
        "n_hashes",
        "kth_min",
        F.round(
            F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double")).otherwise(
                F.lit(float(k - 1)) * F.lit(float(HASH_P)) / F.col("kth_min")
            ),
            6,
        ).alias("est_distinct"),
    )


def kmv_distinct_by_key(
    values: DataFrame, key_col: str, col: str = "value", k: int = 256
) -> DataFrame:
    """Per-key KMV: (key, n_hashes, kth_min, est_distinct) — e.g. distinct
    tokens per host. The k minima are taken with a key-partitioned window
    rank (state bounded by the sort, no per-key collect buffer; a
    collect_set aggregate would hold every hash of a hub key in one
    task's memory)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    from pyspark.sql import Window

    hashed = (
        values.select(F.col(key_col).alias("key"), kmv_hash(F.col(col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("key").orderBy("h")
    minima = hashed.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= k
    )
    return (
        minima.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_hashes"), F.max("h").alias("kth_min"))
        .select(
            "key",
            "n_hashes",
            "kth_min",
            F.round(
                F.when(
                    F.col("n_hashes") < k, F.col("n_hashes").cast("double")
                ).otherwise(
                    F.lit(float(k - 1)) * F.lit(float(HASH_P)) / F.col("kth_min")
                ),
                6,
            ).alias("est_distinct"),
        )
    )
