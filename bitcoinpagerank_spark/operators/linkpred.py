"""Neighborhood-similarity link prediction: common neighbors, Jaccard,
Adamic-Adar.

Not in the reference (mandated by the north_rule's analytics breadth):
these are the standard "which pages should link to each other" scores a
link-graph engine serves — the vertex-pair analog of the document-level
near-dup operators in ``operators/dedup.py``.

Plan shape: one wedge self-join of the symmetric adjacency pivoted on the
shared neighbor, then a hash aggregate on the candidate pair — the same
degree-bounded pattern as the triangle count. The wedge fan-out of a
pivot vertex n is C(deg(n), 2), so one hub makes the join quadratic; the
``max_pivot_degree`` knob drops hub pivots before the join (the standard
mitigation, mirroring the ``df_cap`` contract in
``dedup.ngram_jaccard_pairs`` — a 10^6-degree hub pivot at 10^12-page
scale would alone emit 10^12 candidate rows, and its contribution to any
similarity score is ~0 anyway: Adamic-Adar discounts it by 1/log(deg) and
Jaccard by the union size). Everything is Catalyst: two shuffles
(degree agg + pair agg) plus the wedge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .edges import DST, SRC, undirected_view


def _sym_with_degrees(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(symmetric adjacency (id, nbr), undirected degrees (id, deg))."""
    und = undirected_view(edges)
    sym = und.select(F.col(SRC).alias("id"), F.col(DST).alias("nbr"))
    deg = sym.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    return sym, deg


def common_neighbor_pairs(
    edges: DataFrame,
    min_common: int = 1,
    max_pivot_degree: int | None = None,
) -> DataFrame:
    """(u, v, common) for unordered pairs u < v of the undirected simple
    graph sharing >= ``min_common`` neighbors (existing edges between u
    and v are NOT excluded — callers doing link prediction anti-join the
    edge table, see ``predicted_links``).

    ``max_pivot_degree``: drop shared-neighbor pivots with degree above
    the cap before the wedge join (scale knob; None = exact).
    """
    sym, deg = _sym_with_degrees(edges)
    pivot = sym.select(F.col("nbr").alias("n"), F.col("id").alias("u"))
    if max_pivot_degree is not None:
        ok = deg.where(F.col("deg") <= max_pivot_degree).select(
            F.col("id").alias("n")
        )
        pivot = pivot.join(ok, "n", "left_semi")
    pairs = (
        pivot.alias("l")
        .join(pivot.select(F.col("n"), F.col("u").alias("v")).alias("r"), "n")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    if min_common > 1:
        pairs = pairs.where(F.col("common") >= min_common)
    return pairs


def jaccard_pairs(
    edges: DataFrame,
    min_common: int = 1,
    max_pivot_degree: int | None = None,
) -> DataFrame:
    """(u, v, common, jaccard) — |N(u) ∩ N(v)| / |N(u) ∪ N(v)| per
    candidate pair. Degrees come from the full graph even when the wedge
    join is pivot-capped, so the denominator is exact."""
    _, deg = _sym_with_degrees(edges)
    pairs = common_neighbor_pairs(edges, min_common, max_pivot_degree)
    return (
        pairs.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("deg_u")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("deg_v")), "v")
        .select(
            "u",
            "v",
            "common",
            (
                F.col("common")
                / (F.col("deg_u") + F.col("deg_v") - F.col("common"))
            ).alias("jaccard"),
        )
    )


def adamic_adar_pairs(
    edges: DataFrame,
    min_common: int = 1,
    max_pivot_degree: int | None = None,
) -> DataFrame:
    """(u, v, common, adamic_adar) — sum over shared neighbors n of
    1/ln(deg(n)). A shared neighbor has degree >= 2 by construction, so
    ln(deg) > 0 and every term is finite; hubs contribute ~0, which is
    why ``max_pivot_degree`` barely moves the score while removing the
    quadratic fan-out."""
    sym, deg = _sym_with_degrees(edges)
    pivot = sym.select(F.col("nbr").alias("n"), F.col("id").alias("u")).join(
        deg.select(F.col("id").alias("n"), F.col("deg").alias("deg_n")), "n"
    )
    if max_pivot_degree is not None:
        pivot = pivot.where(F.col("deg_n") <= max_pivot_degree)
    return (
        pivot.alias("l")
        .join(
            pivot.select("n", F.col("u").alias("v"), "deg_n").alias("r"),
            ["n", "deg_n"],
        )
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.lit(1.0) / F.log(F.col("deg_n"))).alias("adamic_adar"),
        )
        .where(F.col("common") >= min_common)
    )


def predicted_links(
    edges: DataFrame,
    min_common: int = 2,
    max_pivot_degree: int | None = None,
) -> DataFrame:
    """Candidate pairs NOT already connected, scored by all three
    measures — the end-to-end link-prediction surface: ONE wedge join →
    anti-join against the existing undirected edge set → score.

    The wedge self-join (the quadratic part) runs once with both
    aggregates fused — count(*) is the common-neighbor count and
    sum(1/ln(deg_n)) the Adamic-Adar mass — instead of composing
    ``jaccard_pairs`` ⋈ ``adamic_adar_pairs``, which each paid their own
    pivot self-join and then a candidate-pair equi-join to glue the
    scores back together (plan: g_predicted_links_before/after.txt — the
    duplicated wedge subtree and the SortMergeJoin between the two
    scored tables are gone). Rows identical: the (n, deg_n) join key
    adds no multiplicity (deg_n is functionally dependent on n), so
    count(*) equals the common-neighbor count, and jaccard derives from
    (common, deg_u, deg_v) exactly as before."""
    sym, deg = _sym_with_degrees(edges)
    pivot = sym.select(F.col("nbr").alias("n"), F.col("id").alias("u")).join(
        deg.select(F.col("id").alias("n"), F.col("deg").alias("deg_n")), "n"
    )
    if max_pivot_degree is not None:
        pivot = pivot.where(F.col("deg_n") <= max_pivot_degree)
    scored = (
        pivot.alias("l")
        .join(
            pivot.select("n", F.col("u").alias("v"), "deg_n").alias("r"),
            ["n", "deg_n"],
        )
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.lit(1.0) / F.log(F.col("deg_n"))).alias("adamic_adar"),
        )
        .where(F.col("common") >= min_common)
        .join(deg.select(F.col("id").alias("u"), F.col("deg").alias("deg_u")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("deg_v")), "v")
        .select(
            "u", "v", "common",
            (
                F.col("common")
                / (F.col("deg_u") + F.col("deg_v") - F.col("common"))
            ).alias("jaccard"),
            "adamic_adar",
        )
    )
    existing = undirected_view(edges).select(
        F.col(SRC).alias("u"), F.col(DST).alias("v")
    )
    return scored.join(existing, ["u", "v"], "left_anti")
