"""Weisfeiler-Lehman structural fingerprints.

Not in the reference; training-data op — WL vertex refinement is the
standard structural fingerprint for graph dedup / isomorphism screening
(two isomorphic graphs produce identical fingerprint MULTISETS; the WL
kernel family builds on exactly this refinement).

Init: label_0(v) = deg(v). Per round:

    label_{k+1}(v) = ( label_k(v)·A + Σ_j ((j·B + 1) mod P) · nlbl_j ) mod P

where nlbl_j is the j-th SMALLEST neighbor label (ties get consecutive
positions; the position-weighted sum over a tied group depends only on
the value and the j-range, so tie order cannot change the result — the
property that keeps the refinement deterministic AND exactly replayable
in SQL, where an engine-native hash would not be).

Plan per round: one neighbor join + one per-vertex rank window (bounded
by degree) + one hash agg — the same shapes as the other iterate loops;
all arithmetic stays in int64 (each product is reduced mod P ≈ 2^31
before the degree-bounded sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .edges import SRC, DST, undirected_view

WL_A = 1_000_003
WL_B = 999_983
WL_P = 2_147_483_647


def wl_fingerprints(
    spark: SparkSession, edges: DataFrame, rounds: int = 2
) -> DataFrame:
    """(id, fingerprint) after ``rounds`` WL refinements over the
    undirected simple graph."""
    if rounds < 1:
        raise ValueError("wl_fingerprints needs rounds >= 1")
    sym = undirected_view(edges)
    labels = sym.groupBy(F.col(SRC).alias("id")).agg(
        F.count(F.lit(1)).alias("lbl")
    )
    for _ in range(rounds):
        nb = sym.join(
            labels.select(F.col("id").alias(DST), F.col("lbl").alias("nlbl")),
            DST,
        ).select(F.col(SRC).alias("id"), "nlbl")
        w = Window.partitionBy("id").orderBy("nlbl")
        ranked = nb.withColumn("j", F.row_number().over(w))
        sums = ranked.groupBy("id").agg(
            F.sum(
                (((F.col("j") * WL_B + 1) % WL_P) * F.col("nlbl")) % WL_P
            ).alias("s")
        )
        labels = (
            labels.join(sums, "id")
            .select(
                "id",
                ((F.col("lbl") * WL_A + F.col("s")) % WL_P).alias("lbl"),
            )
        )
    return labels.select("id", F.col("lbl").alias("fingerprint"))
