"""Deterministic sampling primitives: reproducibility and rate bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bitcoinpagerank_spark.operators.sampling import (
    bernoulli_sample,
    sample_bucket,
    stratified_sample,
    train_test_split,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, lang string").persist()


def test_bernoulli_deterministic_and_in_range(docs):
    a = bernoulli_sample(docs, "doc_id", 10)
    b = bernoulli_sample(docs, "doc_id", 10)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    assert ids_a == sorted(r["doc_id"] for r in b.collect())
    # LCG is uniform-ish: 10% +/- 3pp on 3000 rows
    assert 0.07 < len(ids_a) / 3000 < 0.13
    # sample at pct p is a SUBSET of the sample at pct q > p (nested samples)
    bigger = {r["doc_id"] for r in bernoulli_sample(docs, "doc_id", 50).collect()}
    assert set(ids_a) <= bigger
    assert bernoulli_sample(docs, "doc_id", 0).count() == 0
    assert bernoulli_sample(docs, "doc_id", 100).count() == 3000


def test_stratified_rates(docs):
    out = stratified_sample(docs, "doc_id", "lang", {"en": 100, "de": 0}, 50)
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per["en"] == 1000
    assert "de" not in per
    assert 350 < per.get("zh", 0) < 650


def test_split_stable_under_growth(spark, docs):
    full = {r["doc_id"]: r["split"]
            for r in train_test_split(docs, "doc_id", 20).collect()}
    half = docs.where("doc_id < 1500")
    sub = {r["doc_id"]: r["split"]
           for r in train_test_split(half, "doc_id", 20).collect()}
    # membership is a pure function of the id: subset rows keep their split
    assert all(full[k] == v for k, v in sub.items())
    frac = sum(1 for v in full.values() if v == "test") / len(full)
    assert 0.15 < frac < 0.25


def test_guards(docs):
    with pytest.raises(ValueError):
        bernoulli_sample(docs, "doc_id", 101)
    with pytest.raises(ValueError):
        stratified_sample(docs, "doc_id", "lang", {"en": -1})
    with pytest.raises(ValueError):
        train_test_split(docs, "doc_id", 200)
