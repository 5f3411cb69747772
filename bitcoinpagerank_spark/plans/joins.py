"""The reference's edge-table ETL join chain, re-expressed declaratively.

Reference: PrepareDataset.java:24-35 documents the SQL its five MapReduce
jobs hand-compile (each stage a reduce-side repartition join materialized
to HDFS text, PrepareDataset.java:113-118):

    SELECT txout1.address AS in_address, txout2.address AS out_address
    FROM   txin
    JOIN   tx     ON txin.prev_out  = tx.hash          -- J1, 1-col key
    JOIN   txout txout1 ON txin.prev_id = txout1.tx_id
                       AND txin.prev_out_index = txout1.tx_idx  -- J2, 2-col key
    JOIN   txout txout2 ON txin.tx_id = txout2.tx_id   -- J3, 1-col key

plus DISTINCT out_address (PrepareDistinctOutAddresses.java:45-72) and the
remaining-nodes left-anti join (PrepareRemainingNodesJoin.java:151-167).

Here the chain is one lazy plan; Catalyst chooses broadcast vs sort-merge
per join (the reference hardwires shuffle-shuffle joins and buffers whole
key groups in reducer RAM — PrepareFirstJoin.java:104-121 — which OOMs on
hot keys; Tungsten's spillable joins don't). Join-type parity: the generic
reducer kernel supports inner/leftouter/rightouter/fullouter/anti
(PrepareFirstJoin.java:123-200); Spark natively provides those plus
left_semi — strictly broader (SURVEY.md §2.3 J5).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNKNOWN = "unknown"  # blacklist literal, BuildTextGraph.java:50


def first_join(txin: DataFrame, tx: DataFrame) -> DataFrame:
    """J1: txin ⋈ tx ON prev_out = hash → txinprevid
    (PrepareFirstJoin.java:20-23 output shape)."""
    return (
        txin.join(tx, txin["prev_out"] == tx["hash"], "inner")
        .select(
            txin["prev_out"],
            txin["prev_out_index"],
            txin["tx_id"],
            tx["id"].alias("prev_id"),
        )
    )


def second_join(txinprevid: DataFrame, txout: DataFrame) -> DataFrame:
    """J2: composite 2-column key (prev_id, prev_out_index) = (tx_id, tx_idx)
    → (tx_id, in_address) (PrepareSecondJoin.java:24-27; composite key via
    PairOfStrings in the reference)."""
    left, out1 = txinprevid.alias("l2"), txout.alias("txout1")
    cond = (F.col("l2.prev_id") == F.col("txout1.tx_id")) & (
        F.col("l2.prev_out_index") == F.col("txout1.tx_idx")
    )
    return left.join(out1, cond, "inner").select(
        F.col("l2.tx_id").alias("tx_id"),
        F.col("txout1.address").alias("in_address"),
    )


def third_join(tx_in_addr: DataFrame, txout: DataFrame) -> DataFrame:
    """J3: ⋈ txout ON tx_id → (in_address, out_address) — THE edge table
    (PrepareThirdJoin.java:24-27)."""
    left, out2 = tx_in_addr.alias("l3"), txout.alias("txout2")
    return left.join(
        out2, F.col("l3.tx_id") == F.col("txout2.tx_id"), "inner"
    ).select(
        F.col("l3.in_address").alias("in_address"),
        F.col("txout2.address").alias("out_address"),
    )


def distinct_out_addresses(edges: DataFrame) -> DataFrame:
    """A1 (PrepareDistinctOutAddresses.java:45-72)."""
    return edges.select("out_address").distinct()


def remaining_nodes(edges: DataFrame) -> DataFrame:
    """J4: dst-only addresses — the reference's deliberately modified
    left-outer (emit only right-null) = left-anti
    (PrepareRemainingNodesJoin.java:151-167)."""
    dsts = edges.select(F.col("out_address").alias("address")).distinct()
    srcs = edges.select(F.col("in_address").alias("address")).distinct()
    return dsts.join(srcs, "address", "left_anti")


def symmetric_anti(left: DataFrame, right: DataFrame, on: str | list) -> DataFrame:
    """XOR join: rows whose key appears in exactly one input — the fifth
    type of the reference's generic join kernel (``join.type=anti``,
    PrepareFirstJoin.java:123-200, which emits a row only when exactly one
    side's value list is empty). Composed from two native left-anti joins;
    both sides must share a schema."""
    return left.join(right, on, "left_anti").unionByName(
        right.join(left, on, "left_anti")
    )


def filter_unknown(edges: DataFrame) -> DataFrame:
    """P3: drop edges touching the literal 'unknown' address
    (BuildTextGraph.java:71-77)."""
    return edges.where(
        (F.col("in_address") != UNKNOWN) & (F.col("out_address") != UNKNOWN)
    )


@dataclass
class BitcoinEtlResult:
    edges: DataFrame              # (in_address, out_address)
    distinct_out: DataFrame       # (out_address)
    remaining: DataFrame          # (address) — sink-only vertices


def bitcoin_edge_etl(
    tx: DataFrame, txin: DataFrame, txout: DataFrame, drop_unknown: bool = True
) -> BitcoinEtlResult:
    """The full PrepareDataset chain as one lazy plan."""
    j1 = first_join(txin, tx)
    j2 = second_join(j1, txout)
    edges = third_join(j2, txout)
    if drop_unknown:
        edges = filter_unknown(edges)
    return BitcoinEtlResult(
        edges=edges,
        distinct_out=distinct_out_addresses(edges),
        remaining=remaining_nodes(edges),
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    left_on: list[str],
    right_on: list[str],
    left_time: str,
    right_time: str,
    how: str = "left",
) -> DataFrame:
    """As-of join: attach to each left row the LATEST right row with the
    same key and ``right_time <= left_time`` (equality included).

    Spark has no native as-of operator; this is the scalable composition:
    tag both sides, union, ONE shuffle on the key, and a running
    ``last(..., ignorenulls)`` over a key-partitioned time-ordered window
    — O(|L|+|R|) state per key partition, no range-join blowup, no
    per-left-row right scan. (A naive ``t_r <= t_l`` theta join is
    quadratic per key; this shape is linear and is what AS OF engines do
    under the hood.)

    Right rows must be unique per (key, right_time) — pre-aggregate ties
    upstream, otherwise which tie wins is unspecified. Right payload
    columns (everything but key+time) come back nullable; ``how='inner'``
    drops left rows with no as-of match.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"as_of_join supports left/inner, got {how!r}")
    keys = [f"__k{i}" for i in range(len(left_on))]
    payload = [c for c in right.columns if c not in {*right_on, right_time}]
    if not payload:
        raise ValueError("right side has no payload columns")
    l2 = left.select(
        *[F.col(c).alias(k) for c, k in zip(left_on, keys)],
        F.col(left_time).alias("__t"),
        F.struct(*left.columns).alias("__l"),
    ).withColumn("__side", F.lit(1))
    r2 = right.select(
        *[F.col(c).alias(k) for c, k in zip(right_on, keys)],
        F.col(right_time).alias("__t"),
        F.struct(*payload).alias("__r"),
    ).withColumn("__side", F.lit(0))
    # right rows sort before left rows at equal time → equality matches
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    filled = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    out = filled.where(F.col("__side") == 1)
    if how == "inner":
        out = out.where(F.col("__m").isNotNull())
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(c) for c in payload],
    )


def snapshot_delta(old: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """(keys..., change) — keys present in exactly one snapshot, labeled
    'added' (new only) or 'removed' (old only). The incremental-crawl
    primitive: yesterday's edge/page set vs today's, in ONE full-outer
    join on the key (not two anti-join passes) so each side is scanned
    and shuffled once."""
    o = old.select(*keys).distinct().withColumn("__o", F.lit(1))
    n = new.select(*keys).distinct().withColumn("__n", F.lit(1))
    j = o.join(n, keys, "full_outer")
    return j.where(F.col("__o").isNull() | F.col("__n").isNull()).select(
        *keys,
        F.when(F.col("__o").isNull(), F.lit("added"))
        .otherwise(F.lit("removed"))
        .alias("change"),
    )


def address_graph(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """String-keyed address edges → hashed (src_id, dst_id) ready for the
    graph operators (BuildTextGraph dedups via HashSet,
    BuildTextGraph.java:92-103; BuildTextMultigraph keeps duplicates)."""
    out = edges.select(
        F.xxhash64("in_address").alias("src_id"),
        F.xxhash64("out_address").alias("dst_id"),
    )
    return out.distinct() if dedup else out
