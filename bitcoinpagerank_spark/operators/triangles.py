"""Degree-ordered triangle counting.

Not in the reference (mandated by the north_rule). Algorithm: orient each
undirected edge from the lower-(degree, id) endpoint to the higher one —
every triangle then has exactly one wedge a→b, a→c with b→c, so each is
counted once, and the out-degree of any vertex in the oriented graph is
O(sqrt(|E|)), which bounds the wedge join even in the presence of hubs
(the standard mitigation for the hub blowup a naive self-join suffers).

Plan: two equi-joins + a count — all Catalyst; AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .edges import SRC, DST, undirected_view


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Undirected simple edges oriented low-(degree,id) → high-(degree,id).

    Input may be directed/multigraph; orientation works on the canonical
    (min, max) pair set — equivalent to deduplicating the symmetric
    closure and keeping src < dst, but the distinct runs over |E| rows
    instead of 2|E| (the old ``undirected_view().where(src < dst)`` paid
    a union + distinct over both orientations only to drop half of them
    again). Undirected degrees come from one endpoint-union aggregate of
    the canonical set — identical values, one less full-symmetric scan.
    """
    canon = (
        edges.select(
            F.least(F.col(SRC), F.col(DST)).alias(SRC),
            F.greatest(F.col(SRC), F.col(DST)).alias(DST),
        )
        .where(F.col(SRC).isNotNull() & F.col(DST).isNotNull())
        .where(F.col(SRC) != F.col(DST))
        .distinct()
    )
    deg = (
        canon.select(F.col(SRC).alias("id"))
        .unionAll(canon.select(F.col(DST).alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        canon
        .join(deg.select(F.col("id").alias(SRC), F.col("deg").alias("deg_u")), SRC)
        .join(deg.select(F.col("id").alias(DST), F.col("deg").alias("deg_v")), DST)
    )
    keep_uv = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col(SRC) < F.col(DST))
    )
    return e.select(
        F.when(keep_uv, F.col(SRC)).otherwise(F.col(DST)).alias("u"),
        F.when(keep_uv, F.col(DST)).otherwise(F.col(SRC)).alias("v"),
    )


def triangle_count(edges: DataFrame) -> int:
    """Total number of triangles in the undirected simple graph."""
    o = oriented_edges(edges).persist()
    try:
        e1 = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
        e2 = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
        wedges = e1.join(e2, "b").select("a", "b", "c")
        closing = o.select(F.col("u").alias("a"), F.col("v").alias("c"))
        return wedges.join(closing, ["a", "c"], "inner").count()
    finally:
        o.unpersist()


def triangle_count_per_vertex(edges: DataFrame) -> DataFrame:
    """(id, triangles) — number of triangles each vertex participates in."""
    o = oriented_edges(edges).persist()
    e1 = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(o.select(F.col("u").alias("a"), F.col("v").alias("c")), ["a", "c"])
    )
    per_vertex = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    return per_vertex


def global_transitivity(edges: DataFrame) -> DataFrame:
    """Single-row (n_triangles, n_wedges, transitivity) where
    transitivity = 3*T / W, W = Σ_v deg(v)·(deg(v)−1)/2 over the
    undirected simple graph (0.0 when the graph has no wedges).

    One lazy plan: the degree aggregate (wedge count) and the oriented
    triangle count are each 1-row aggregates cross-joined at the end —
    no driver-side action inside the operator, so it composes into
    larger plans and both sides reuse the same shuffle-free scan of the
    (persisted-by-caller) edge table."""
    und = undirected_view(edges)
    wedges = (
        und.groupBy(F.col(SRC).alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .agg(F.sum(F.col("deg") * (F.col("deg") - 1) / 2).alias("n_wedges"))
        .select(F.col("n_wedges").cast("long").alias("n_wedges"))
    )
    o = oriented_edges(edges)
    e1 = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(o.select(F.col("u").alias("a"), F.col("v").alias("c")), ["a", "c"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return tri.crossJoin(wedges).select(
        "n_triangles",
        "n_wedges",
        F.when(
            F.col("n_wedges") > 0,
            3.0 * F.col("n_triangles") / F.col("n_wedges"),
        )
        .otherwise(0.0)
        .alias("transitivity"),
    )


def local_clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, deg, triangles, lcc) over the undirected simple graph:
    lcc = 2*T(v) / (deg(v) * (deg(v)-1)), 0 for deg < 2.

    Composition of the degree-ordered per-vertex triangle count with the
    undirected degrees — two hash aggregates and a left join, all
    Catalyst; inherits the O(sqrt(E)) wedge bound of oriented_edges."""
    und = undirected_view(edges)
    deg = und.groupBy(F.col(SRC).alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    tri = triangle_count_per_vertex(edges)
    return deg.join(tri, "id", "left").select(
        "id",
        "deg",
        F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
        F.when(
            F.col("deg") >= 2,
            2.0
            * F.coalesce(F.col("triangles"), F.lit(0))
            / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(0.0)
        .alias("lcc"),
    )


def rectangle_count(
    edges: DataFrame, max_wedge_degree: int | None = None
) -> DataFrame:
    """1-row (n_wedge_pairs, n_rectangles): 4-cycle count via wedge
    pairing — wedges a–m–b grouped by unordered endpoints (a < b), each
    group of w wedges closes C(w,2) endpoint pairs, and every 4-cycle is
    counted at BOTH of its opposite-vertex pairs, hence the final /2.

    The wedge join is Σ deg² over wedge midpoints — a 10^6-degree web
    hub alone contributes 10^12 wedge rows. ``max_wedge_degree`` removes
    vertices above the cap BEFORE the self-join (the same scale contract
    as linkpred's ``max_pivot_degree`` and dedup's ``df_cap``): the
    result is then EXACT on the subgraph induced by vertices of
    undirected degree ≤ cap — a well-defined estimate, not a silent
    half-count (filtering midpoints alone would count hub-cornered
    rectangles at one of their two opposite pairs). Default ``None`` =
    exact on the full graph."""
    sym = undirected_view(edges)
    if max_wedge_degree is not None:
        keep = (
            sym.groupBy(F.col(SRC).alias("id"))
            .agg(F.count(F.lit(1)).alias("_wdeg"))
            .where(F.col("_wdeg") <= max_wedge_degree)
            .select("id")
        )
        sym = (
            sym.join(keep.withColumnRenamed("id", SRC), SRC, "left_semi")
            .join(keep.withColumnRenamed("id", DST), DST, "left_semi")
            .select(SRC, DST)
        )
    wedges = (
        sym.select(F.col(SRC).alias("m"), F.col(DST).alias("a"))
        .join(sym.select(F.col(SRC).alias("m"), F.col(DST).alias("b")), "m")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return wedges.agg(
        F.sum(F.col("w") * (F.col("w") - 1) / 2).cast("long").alias("n_wedge_pairs")
    ).select(
        "n_wedge_pairs",
        (F.col("n_wedge_pairs") / 2).cast("long").alias("n_rectangles"),
    )
