"""Property tests for the portable hash/similarity column library
(functions/hashing.py): Spark expressions vs plain-Python references,
plus LSH behavioral properties (identical inputs always collide)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from docling_api_spark.functions import hashing as H


def _py_md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


@pytest.fixture(scope="module")
def df(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b a b c",
        "one",
        "",
        "x y z x y z x y z w",
    ]
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id int, text string")


def test_md5_long_matches_python(df):
    rows = df.select("text", H.md5_long(F.col("text")).alias("h")).collect()
    for r in rows:
        assert r.h == _py_md5_long(r.text)


def test_tokens_and_shingles(df):
    rows = (
        df.select(
            "text",
            H.tokens(F.col("text")).alias("tok"),
            H.word_shingles(H.tokens(F.col("text")), 3).alias("sh"),
        )
        .collect()
    )
    for r in rows:
        toks = r.text.split()
        assert list(r.tok) == toks
        want = []
        for i in range(max(len(toks) - 2, 0)):
            s = " ".join(toks[i : i + 3])
            if s not in want:
                want.append(s)
        assert list(r.sh) == want


def test_window_hashes_positional(df):
    rows = (
        df.select("text", H.window_hashes(H.tokens(F.col("text")), 3).alias("wh"))
        .collect()
    )
    for r in rows:
        toks = r.text.split()
        want = [
            _py_md5_long(" ".join(toks[i : i + 3]))
            for i in range(max(len(toks) - 2, 0))
        ]
        # positional, NOT deduped: "x y z x y z x y z w" repeats windows
        assert list(r.wh) == want


def test_minhash_identical_texts_identical_sigs(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta epsilon")],
        "id int, text string",
    )
    sh = H.word_shingles(H.tokens(F.col("text")), 3)
    rows = df.select(H.minhash_signature(sh, 16).alias("sig")).collect()
    assert list(rows[0].sig) == list(rows[1].sig)
    assert len(rows[0].sig) == 16


def test_minhash_python_reference(spark):
    text = "alpha beta gamma delta epsilon zeta"
    toks = text.split()
    shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    P = H.MINHASH_P
    want = []
    for i in range(8):
        a, b = H.minhash_consts(i)
        want.append(min((a * (_py_md5_long(s) % P) + b) % P for s in shingles))
    df = spark.createDataFrame([(text,)], "text string")
    sig = df.select(
        H.minhash_signature(H.word_shingles(H.tokens(F.col("text")), 3), 8).alias("sig")
    ).first()
    assert list(sig.sig) == want


def test_simhash_python_reference(spark):
    text = "the quick brown fox"
    hashes = [_py_md5_long(t) for t in text.split()]
    want = 0
    for b in range(32):
        vote = sum(1 if (h >> b) & 1 else -1 for h in hashes)
        if vote > 0:
            want |= 1 << b
    got = (
        spark.createDataFrame([(text,)], "text string")
        .select(H.simhash32(H.tokens(F.col("text"))).alias("s"))
        .first()
        .s
    )
    assert got == want


def test_hamming(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    assert df.select(H.hamming32(F.col("a"), F.col("b")).alias("d")).first().d == 2


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([("a b c",), ("c b a",)], "text string")
    rows = df.select(H.rolling_fingerprint(H.tokens(F.col("text"))).alias("fp")).collect()
    assert rows[0].fp != rows[1].fp


def test_cosine_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0], 1.0), ([1.0, 0.0], [0.0, 1.0], 0.0)],
        "a array<float>, b array<float>, want double",
    )
    rows = df.select(H.cosine(F.col("a"), F.col("b")).alias("c"), "want").collect()
    for r in rows:
        assert abs(r.c - r.want) < 1e-9


def test_srp_identical_vectors_same_bucket(spark):
    planes = H.srp_planes(4, 8)
    assert len(planes) == 8 and len(planes[0]) == 4
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.1, 0.9]), (2, [0.5, -0.25, 0.1, 0.9]), (3, [-0.5, 0.25, -0.1, -0.9])],
        "id int, v array<float>",
    )
    rows = df.select("id", H.srp_signature(F.col("v"), planes).alias("b")).collect()
    by_id = {r.id: r.b for r in rows}
    assert by_id[1] == by_id[2]
    # antipodal vector flips every nonzero-dot bit
    assert by_id[1] != by_id[3]
