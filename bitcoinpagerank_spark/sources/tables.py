"""Text/CSV sources and sinks (reference operators S1, S6, S10).

The reference reads positional CSV text (`TextInputFormat` + split(","),
PrepareFirstJoin.java:40-41), writes text with a configurable separator
(`mapred.textoutputformat.separator`, PrepareDataset.java:70,315), and dumps
binary records to plain text (DumpPageRankRecordsToPlainText.java:36-94).
Here: schema-explicit CSV scans (no inference — the reference's positional
contract made explicit), CSV sinks with configurable separator, and a
plain-text dump for ranks tables. Single-file report output uses
``coalesce(1)`` — only ever for small reports (the copyMerge analog,
BuildTextGraph.java:200-208).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TX_SCHEMA = "id long, hash string"
TXIN_SCHEMA = (
    "id long, tx_idx int, prev_out string, prev_out_index long, tx_id long"
)
TXOUT_SCHEMA = (
    "id long, tx_idx int, address string, value long, type string, tx_id long"
)


def read_csv(
    spark: SparkSession, path: str, schema: str, sep: str = ","
) -> DataFrame:
    """Schema-explicit CSV scan (S1). Malformed rows → nulls (PERMISSIVE),
    matching the reference's skip-on-null-guard behavior (P2)."""
    return spark.read.schema(schema).option("sep", sep).option(
        "mode", "PERMISSIVE"
    ).csv(path)


def write_csv(
    df: DataFrame, path: str, sep: str = ",", single_file: bool = False
) -> None:
    """CSV sink with configurable separator (S6). ``single_file`` is the
    copyMerge analog (S9) — reports only, never large tables."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("sep", sep).csv(path)


def dump_ranks_text(
    ranks: DataFrame, path: str, log_space: bool = False
) -> None:
    """Plain-text rank dump (S10): one ``id<TAB>score`` line per vertex.
    ``log_space=True`` reproduces the reference's log-score %.5f format
    (FindMaxPageRankNodes.java:91 / SequentialPageRank.java:98)."""
    score = F.log(F.col("score")) if log_space else F.col("score")
    lines = ranks.select(
        F.concat_ws(
            "\t", F.col("id").cast("string"), F.format_number(score, 5)
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Schema-explicit JSON-lines scan — inference disabled for the same
    reason as read_csv: at 100 TB a schema-inference pre-pass is a full
    extra read, and silent type widening between files corrupts joins.
    Malformed lines → nulls (PERMISSIVE), the S1/P2 contract."""
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink (interchange format for downstream non-Spark
    consumers; columnar parquet/ORC remain the engine-internal formats)."""
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — second columnar format (native Spark reader, vectorized,
    predicate pushdown like parquet); lets the engine ingest warehouse
    tables written by Hive/Trino pipelines without conversion."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 32
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) by ``key`` into the
    session catalog — the co-location lever for repeated joins: two
    tables bucketed by the same key join with ZERO exchange on either
    side (and zero sort for sort-merge), because the on-disk layout IS
    the shuffle. At 100 TB this converts every edges⋈ranks-style join
    from a full network shuffle into local stitching; the bucket count
    should match the stored graph's partition plan."""
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket layout intact (plain
    ``spark.read.parquet`` on the files would DROP the bucket metadata —
    the catalog table carries it)."""
    return spark.read.table(table)
