"""Driver-contract rehearsal: run every catalog query in Spark and its
oracle SQL in DuckDB on the same parquet tables; compare row multisets
(columns aligned by name, floats canonicalized) — the same shape of check
the driver records in CORRECTNESS_r{N}.json."""

from __future__ import annotations

import math

import duckdb
import pytest

from bitcoinpagerank_spark.plans import catalog

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(row[i]) for i in order) for row in data
    )


ORACLED = sorted(catalog.oracle_sql())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, con, name):
    fn = catalog.queries()[name]
    sql = catalog.oracle_sql()[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_data = [tuple(r) for r in sdf.collect()]
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_data = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    got = _rows(spark_cols, spark_data)
    want = _rows(duck_cols, duck_data)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    assert got == want, f"{name}: value mismatch (first diff: "


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_output_types_are_hashable(con, name):
    """Type discipline: DuckDB promotes sum()/arithmetic over BIGINT to
    HUGEINT, which surfaces through Arrow as decimal128 — the driver's
    value hash is type-sensitive, so such an oracle red-flags even when
    every value equals Spark's int64 (the g_wl_fingerprint_r2 r03
    regression). Assert no oracle ever emits decimal/hugeint types."""
    import pyarrow as pa

    schema = con.execute(catalog.oracle_sql()[name]).fetch_arrow_table().schema
    bad = [
        f.name
        for f in schema
        if pa.types.is_decimal(f.type)
    ]
    assert not bad, (
        f"{name}: oracle columns {bad} surface as decimal128 (DuckDB "
        f"HUGEINT/DECIMAL promotion) — wrap with CAST(... AS BIGINT/DOUBLE)"
    )


def test_driver_window_spends_no_slot_on_rows_only():
    """The driver value-checks only the first 50 entries of queries();
    rows-only (no-oracle) entries must never occupy one of those slots."""
    first50 = list(catalog.queries())[:50]
    oracled = set(catalog.oracle_sql())
    wasted = [n for n in first50 if n not in oracled]
    assert not wasted, f"rows-only entries inside the driver window: {wasted}"


def test_rows_only_queries_run(spark):
    for name, fn in catalog.queries().items():
        if name in catalog.oracle_sql():
            continue
        df = fn(spark, SF_DIR)
        assert df.count() >= 0, name
