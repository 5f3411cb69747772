"""Per-partition CSR adjacency blocks — the north_star's explicit layout.

Replaces the reference's adjacency assembly (BuildTextGraph.java:82-113:
group-by-src + HashSet + string concat) and its per-row neighbor loop in the
PageRank mapper (RunPageRankBasic.java:79-88) with columnar blocks consumed
by a numpy gather inside a cogrouped Arrow UDF — no per-row Python.

Block layout (one row per (part, shard)):
    part      int      — pmod(src_id, P): the graph partition
    shard     int      — salting: blocks are capped at ``max_block_edges``
                         edges so a heavy hub never creates an oversized
                         Arrow batch (SURVEY.md §4.2 item 2; the reference's
                         hot-key reducer simply buffers unbounded RAM,
                         PrepareFirstJoin.java:104-121). A single hub's
                         edges may span shards — contributions re-merge in
                         the by-destination sum, weights stay 1/global_deg.
    src_ids   array<long>    — block-local source vertices (sorted)
    src_w     array<double>  — 1/out_degree per source (global degree)
    indptr    array<int>     — CSR row pointers into dst_ids
    dst_ids   array<long>    — concatenated adjacency
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .edges import SRC, DST, out_degrees

BLOCK_SCHEMA = (
    "part int, shard int, src_ids array<long>, src_w array<double>, "
    "indptr array<int>, dst_ids array<long>"
)

DEFAULT_MAX_BLOCK_EDGES = 2_000_000


def build_csr_blocks(
    edges: DataFrame,
    num_partitions: int,
    max_block_edges: int = DEFAULT_MAX_BLOCK_EDGES,
) -> DataFrame:
    """Group edges by pmod(src_id, P) and pack each partition into CSR
    shards of at most ``max_block_edges`` edges."""
    deg = out_degrees(edges)
    tagged = (
        edges.join(deg, edges[SRC] == deg["id"], "inner")
        .select(
            F.col(SRC),
            F.col(DST),
            (F.lit(1.0) / F.col("out_degree").cast("double")).alias("w"),
            F.pmod(F.col(SRC), F.lit(num_partitions)).cast("int").alias("part"),
        )
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([SRC, DST], kind="mergesort")
        part = int(pdf["part"].iloc[0])
        src = pdf[SRC].to_numpy(np.int64)
        dst = pdf[DST].to_numpy(np.int64)
        w = pdf["w"].to_numpy(np.float64)
        n = len(src)
        rows = []
        for shard_no, lo in enumerate(range(0, n, max_block_edges)):
            hi = min(lo + max_block_edges, n)
            s_src, s_dst, s_w = src[lo:hi], dst[lo:hi], w[lo:hi]
            # CSR within the shard: runs of equal src
            uniq, first_idx = np.unique(s_src, return_index=True)
            order = np.argsort(first_idx, kind="mergesort")
            uniq, first_idx = uniq[order], first_idx[order]
            counts = np.diff(np.append(first_idx, len(s_src)))
            indptr = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
            rows.append(
                {
                    "part": part,
                    "shard": shard_no,
                    "src_ids": uniq.tolist(),
                    "src_w": s_w[first_idx].tolist(),
                    "indptr": indptr.tolist(),
                    "dst_ids": s_dst.tolist(),
                }
            )
        return pd.DataFrame(
            rows, columns=["part", "shard", "src_ids", "src_w", "indptr", "dst_ids"]
        )

    return tagged.groupBy("part").applyInPandas(pack, schema=BLOCK_SCHEMA)


def csr_step(
    ranks: DataFrame,
    csr_blocks: DataFrame,
    n: int,
    missing: float,
    alpha: float,
    num_partitions: int,
) -> DataFrame:
    """One PageRank step: cogroup scores with CSR blocks on ``part``,
    numpy-gather scores → fan out → block-local partial sum by dst →
    global groupBy(dst).sum → damp + dangling."""
    scored = ranks.withColumn(
        "part", F.pmod(F.col("id"), F.lit(num_partitions)).cast("int")
    )

    def emit(scores_pdf: pd.DataFrame, blocks_pdf: pd.DataFrame) -> pd.DataFrame:
        if blocks_pdf.empty or scores_pdf.empty:
            return pd.DataFrame({"dst_id": pd.Series(dtype="int64"),
                                 "mass": pd.Series(dtype="float64")})
        score = pd.Series(
            scores_pdf["score"].to_numpy(np.float64),
            index=scores_pdf["id"].to_numpy(np.int64),
        )
        outs: list[np.ndarray] = []
        masses: list[np.ndarray] = []
        for _, row in blocks_pdf.iterrows():
            srcs = np.asarray(row["src_ids"], dtype=np.int64)
            w = np.asarray(row["src_w"], dtype=np.float64)
            indptr = np.asarray(row["indptr"], dtype=np.int64)
            dsts = np.asarray(row["dst_ids"], dtype=np.int64)
            per_src = score.loc[srcs].to_numpy(np.float64) * w
            mass = np.repeat(per_src, np.diff(indptr))
            # block-local partial aggregation (the reference's combiner,
            # RunPageRankBasic.java:180-210, done vectorized)
            u, inv = np.unique(dsts, return_inverse=True)
            outs.append(u)
            masses.append(np.bincount(inv, weights=mass))
        return pd.DataFrame(
            {"dst_id": np.concatenate(outs), "mass": np.concatenate(masses)}
        )

    recv = (
        scored.groupBy("part")
        .cogroup(csr_blocks.groupBy("part"))
        .applyInPandas(emit, schema="dst_id long, mass double")
        .groupBy("dst_id")
        .agg(F.sum("mass").alias("recv"))
    )
    new_score = F.lit(alpha / n) + F.lit(1.0 - alpha) * (
        F.coalesce(F.col("recv"), F.lit(0.0)) + F.lit(missing / n)
    )
    return ranks.join(recv, ranks["id"] == recv["dst_id"], "left").select(
        "id",
        "dangling",
        new_score.alias("score"),
        F.col("score").alias("old_score"),
    )
