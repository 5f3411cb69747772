from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bitcoinpagerank_spark.functions.text import (
    HASH_P,
    LANG_MARKERS,
    SHINGLE_A,
    STOPWORDS,
    lang_id,
    quality_score,
    token_count,
    token_dictionary,
    with_text_features,
)


def py_tokens(text):
    return [t for t in re.split(r"\s+", text.lower()) if t]


def py_quality(text):
    toks = py_tokens(text)
    stop = sum(1 for t in toks if t in STOPWORDS) / max(len(toks), 1)
    low = text.lower()
    alpha = len(re.sub(r"[^a-z ]", "", low)) / max(len(low), 1)
    return 0.4 * stop + 0.3 * min(1.0, len(toks) / 100.0) + 0.3 * alpha


def py_lang(text):
    toks = py_tokens(text)
    scores = {
        lang: sum(1 for t in toks if t in marks)
        for lang, marks in LANG_MARKERS.items()
    }
    scores["zh"] = len(re.findall(r"[一-鿿]", text))
    m = max(scores.values())
    if m == 0:
        return "und"
    return sorted(l for l, s in scores.items() if s == m)[0]


SAMPLES = [
    "The quick brown fox and the lazy dog",
    "der hund und die katze ist hier",
    "le chat et la souris est petit",
    "el gato y los perros es grande",
    "你好 世界 这是 中文",
    "zzz qqq xxx",
    "",
    "  multiple   spaces\tand\ttabs ",
]


def test_text_features_vs_python(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "id int, text string")
    rows = df.select(
        "id",
        "text",
        token_count(F.col("text")).alias("n"),
        F.round(quality_score(F.col("text")), 9).alias("q"),
        lang_id(F.col("text")).alias("lang"),
    ).collect()
    for r in rows:
        assert r["n"] == len(py_tokens(r["text"])), r["text"]
        assert r["q"] == pytest.approx(py_quality(r["text"]), abs=1e-6), r["text"]
        assert r["lang"] == py_lang(r["text"]), r["text"]


def test_lang_id_on_testdata(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = with_text_features(docs.limit(50))
    rows = out.select("text", "lang_pred").collect()
    for r in rows:
        assert r["lang_pred"] == py_lang(r["text"])


def test_token_dictionary_dense_sorted(spark):
    df = spark.createDataFrame([(1, "b a c a"), (2, "c d")], "doc_id int, text string")
    d = {r["token"]: r["tid"] for r in token_dictionary(df).collect()}
    assert d == {"a": 1, "b": 2, "c": 3, "d": 4}


def test_shingle_hash_portable(spark):
    from bitcoinpagerank_spark.functions.text import shingle_ids

    df = spark.createDataFrame([(1, [5, 7, 11, 13])], "id int, tids array<long>")
    got = df.select(shingle_ids(F.col("tids")).alias("s")).first()["s"]
    want = [
        (5 * SHINGLE_A[0] + 7 * SHINGLE_A[1] + 11 * SHINGLE_A[2]) % HASH_P,
        (7 * SHINGLE_A[0] + 11 * SHINGLE_A[1] + 13 * SHINGLE_A[2]) % HASH_P,
    ]
    assert got == want


@pytest.mark.parametrize("tids", [[], [5], [5, 7]])
def test_shingles_empty_for_short_docs(spark, tids):
    # regression: sequence(1, 0) in Spark is DESCENDING, not empty
    from bitcoinpagerank_spark.functions.text import shingle_ids

    df = spark.createDataFrame([(1, tids)], "id int, tids array<long>")
    assert df.select(shingle_ids(F.col("tids")).alias("s")).first()["s"] == []


def test_winnow_fingerprints(spark):
    """Winnowing: distinct window-of-w minima over positional shingles;
    short docs yield empty sets; identical docs identical sets."""
    from bitcoinpagerank_spark.functions.text import (
        shingle_ids, token_dictionary, winnow_fingerprints,
    )
    from bitcoinpagerank_spark.operators.dedup import doc_token_ids
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "a b")],
        "doc_id long, text string",
    )
    tids = doc_token_ids(docs, dictionary=token_dictionary(docs))
    rows = tids.select(
        "id",
        shingle_ids(F.col("tids")).alias("sh"),
        winnow_fingerprints(F.col("tids"), w=4).alias("fp"),
    ).collect()
    by_id = {r["id"]: r for r in rows}
    # python reference for doc 1: 6 shingles, windows of 4 -> 3 minima
    sh = by_id[1]["sh"]
    want = sorted({min(sh[i:i + 4]) for i in range(len(sh) - 3)})
    assert sorted(by_id[1]["fp"]) == want
    assert sorted(by_id[2]["fp"]) == want  # identical doc
    assert by_id[3]["fp"] == []            # < 3 tokens -> no shingles


# ---------------------------------------------------------- tf-idf / bm25

def test_tfidf_hand_values(spark):
    import math

    from bitcoinpagerank_spark.functions.text import tfidf

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "dog fish"), (3, "cat")],
        "doc_id long, text string",
    )
    rows = {(r["id"], r["term"]): r for r in tfidf(docs, 3).collect()}
    # cat: tf=2 in doc1, df=2; smooth idf = ln(4/3)+1
    r = rows[(1, "cat")]
    assert r["tf"] == 2 and r["df"] == 2
    assert r["tfidf"] == pytest.approx(2 * (math.log(4 / 3) + 1))
    # fish: df=1 -> idf = ln(4/2)+1
    assert rows[(2, "fish")]["tfidf"] == pytest.approx(math.log(2) + 1)


def test_bm25_hand_values(spark):
    import math

    from bitcoinpagerank_spark.functions.text import bm25_scores

    docs = spark.createDataFrame(
        [(1, "cat dog cat"), (2, "dog fish"), (3, "cat")],
        "doc_id long, text string",
    )
    n, avg_len = 3, 2.0  # (3+2+1)/3
    got = {r["id"]: r["score"] for r in
           bm25_scores(docs, ["cat"], n, avg_len).collect()}
    assert set(got) == {1, 3}  # doc 2 has no 'cat'
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    def bm25(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avg_len))
    assert got[1] == pytest.approx(bm25(2, 3))
    assert got[3] == pytest.approx(bm25(1, 1))
    with pytest.raises(ValueError):
        bm25_scores(docs, [], n, avg_len)


def test_udaf_geometric_mean(spark):
    import math

    from bitcoinpagerank_spark.functions.udafs import geometric_mean
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a", 1.0), ("a", 4.0), ("b", 9.0)], "k string, v double")
    got = {r["k"]: r["g"] for r in
           df.groupBy("k").agg(geometric_mean("v").alias("g")).collect()}
    assert got["a"] == pytest.approx(math.sqrt(4.0))
    assert got["b"] == pytest.approx(9.0)


def test_chunk_documents_windows_and_tail(spark):
    from bitcoinpagerank_spark.functions.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, words),          # 10 tokens: w=4, s=3 -> 0..3,3..6,6..9,9
            (2, "only two"),     # short doc: single chunk kept
            (3, "   "),          # whitespace-only: no chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, window=4, stride=3, min_tokens=2)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: starts 0,3,6,9 -> windows of 4,4,4,1; the 1-token tail (<2) drops
    assert sorted(k for k in rows if k[0] == 1) == [(1, 0), (1, 1), (1, 2)]
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[(1, 1)]["chunk_text"] == "w3 w4 w5 w6"  # overlap of 1
    assert rows[(1, 2)]["n_tokens"] == 4
    # doc 2: below min_tokens but chunk_idx 0 is always kept
    assert rows[(2, 0)]["chunk_text"] == "only two"
    assert not any(k[0] == 3 for k in rows)


def test_chunk_documents_no_contained_tail(spark):
    """A tail window fully contained in the previous window is never
    emitted, even when it passes min_tokens (ADVICE r5: n=window with
    stride<window used to duplicate chunk 0's suffix as a second
    chunk)."""
    from bitcoinpagerank_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(4))),   # n == window
            (2, " ".join(f"w{i}" for i in range(6))),   # tail adds new tokens
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, window=4, stride=3, min_tokens=1)
    rows = {(r["doc_id"], r["chunk_idx"]): r for r in out.collect()}
    # doc 1: start 3 would give w3 only — contained in chunk 0 — dropped
    assert sorted(k for k in rows if k[0] == 1) == [(1, 0)]
    # doc 2: start 3 covers w3..w5, which extends past chunk 0 — kept
    assert sorted(k for k in rows if k[0] == 2) == [(2, 0), (2, 1)]
    assert rows[(2, 1)]["chunk_text"] == "w3 w4 w5"


def test_subword_tokens_greedy_longest_match(spark):
    """One regex = greedy longest-match: vocab pieces consume greedily
    left-to-right, longest alternative first, single-char fallback,
    whitespace never fused."""
    from bitcoinpagerank_spark.functions.text import (
        subword_token_count,
        subword_tokens_col,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("Tables scanned fast",), ("xq zz",), ("",)], "text string"
    )
    out = df.select(
        subword_tokens_col(F.col("text")).alias("p"),
        subword_token_count(F.col("text")).alias("n"),
    ).collect()
    # 'tables' -> table+s (longest-first, not t+a+b+...); 'scanned' ->
    # scan+n+ed; pieces never span the space
    assert out[0]["p"] == ["table", "s", "scan", "n", "ed", "fast"]
    assert out[0]["n"] == 6
    assert out[1]["p"] == ["x", "q", "z", "z"]  # pure fallback
    assert out[2]["p"] == []


def test_chunk_documents_subword_tokenizer(spark):
    from bitcoinpagerank_spark.functions.text import chunk_documents

    import pytest as _pytest

    docs = spark.createDataFrame(
        # 'tables scanned tables scanned' -> 10 subword pieces
        [(1, "tables scanned tables scanned")], "doc_id long, text string"
    )
    out = chunk_documents(
        docs, window=6, stride=4, min_tokens=2, tokenizer="subword"
    )
    rows = {r["chunk_idx"]: r for r in out.collect()}
    assert rows[0]["chunk_text"] == "table s scan n ed table"
    assert rows[0]["n_tokens"] == 6
    assert rows[1]["chunk_text"] == "ed table s scan n ed"  # overlap 2
    # window/stride are measured in SUBWORD units, not whitespace words
    assert all(r["n_tokens"] <= 6 for r in rows.values())
    with _pytest.raises(ValueError, match="unknown tokenizer"):
        chunk_documents(docs, tokenizer="bytes")


def test_repetition_stats_hand_values(spark):
    from bitcoinpagerank_spark.functions.text import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),    # 6 tokens; 'a b' x3 of 5 bigrams
            (2, "x y z"),          # all n-grams unique
            (3, "solo"),           # no 2-grams at all
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert rows[1]["n_tokens"] == 6
    assert rows[1]["top2gram_frac"] == pytest.approx(3 * 2 / 6)   # 'a b'
    assert rows[1]["top3gram_frac"] == pytest.approx(2 * 3 / 6)   # 'a b a'
    assert rows[2]["top2gram_frac"] == pytest.approx(1 * 2 / 3)
    assert rows[3]["top2gram_frac"] == 0.0
    assert rows[3]["top3gram_frac"] == 0.0
