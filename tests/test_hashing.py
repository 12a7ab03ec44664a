"""MinHash / SimHash / n-gram / fingerprint determinism & accuracy."""

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.functions.hashing import (
    char_ngrams,
    hamming64,
    lsh_band_keys,
    minhash_signature,
    rolling_fingerprint,
    simhash64,
    word_shingles,
)
from entity_linking_spark.functions.text import words


def test_char_ngrams(spark):
    df = spark.createDataFrame([("abcd",), ("ab",), ("",)], "t string")
    got = [r["g"] for r in df.select(char_ngrams("t", 3, distinct=False).alias("g")).collect()]
    assert got[0] == ["abc", "bcd"]
    assert got[1] == ["ab"]   # shorter than n → the string itself
    assert got[2] == [""]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "t string")
    got = df.select(word_shingles(words("t"), 2).alias("s")).collect()[0]["s"]
    assert got == ["a b", "b c", "c d"]


def test_ngrams_and_shingles_treat_null_as_empty(spark):
    """NULL text must behave like "" — F.split propagates NULL, which
    (r5 zip_with rewrite) silently turned NULL-surface gram arrays into
    NULL, dropping those rows from blocking candidate generation
    entirely (explode of NULL emits zero rows)."""
    df = spark.createDataFrame([(None,)], "t string")
    row = df.select(
        char_ngrams("t", 3).alias("g"),
        word_shingles(words("t"), 2).alias("s"),
    ).collect()[0]
    assert row["g"] == [""]
    assert row["s"] == [""]


def test_minhash_estimates_jaccard(spark):
    """Signature-agreement fraction ≈ true Jaccard (±0.2 at 64 hashes)."""
    a = set("the quick brown fox jumps over the lazy dog".split())
    b = set("the quick brown fox leaps over a lazy cat".split())
    true_j = len(a & b) / len(a | b)
    df = spark.createDataFrame([(list(a), list(b))], "a array<string>, b array<string>")
    est = df.select(
        (
            F.size(
                F.filter(
                    F.zip_with(
                        minhash_signature("a", 64), minhash_signature("b", 64),
                        lambda p, q: p == q,
                    ),
                    lambda x: x,
                )
            )
            / 64.0
        ).alias("est")
    ).collect()[0]["est"]
    assert est == pytest.approx(true_j, abs=0.2)


def test_minhash_deterministic(spark):
    df = spark.createDataFrame([(["x", "y", "z"],)], "t array<string>")
    s1 = df.select(minhash_signature("t", 16).alias("s")).collect()[0]["s"]
    s2 = df.select(minhash_signature("t", 16).alias("s")).collect()[0]["s"]
    assert s1 == s2
    # identical sets → identical band keys
    df2 = spark.createDataFrame([(["z", "y", "x"],)], "t array<string>")
    s3 = df2.select(minhash_signature("t", 16).alias("s")).collect()[0]["s"]
    assert s1 == s3  # set semantics: order must not matter


def test_lsh_band_keys_shape(spark):
    df = spark.createDataFrame([(["x", "y"],)], "t array<string>")
    keys = df.select(
        lsh_band_keys(minhash_signature("t", 16), 4, 4).alias("k")
    ).collect()[0]["k"]
    assert len(keys) == 4
    assert all(k.startswith("b") for k in keys)


def test_lsh_band_keys_compact_parity(spark):
    """compact=True folds (band idx, slice hash) to one bigint: same
    collision structure as the string form — two rows share string band
    key i iff they share compact band key i."""
    df = spark.createDataFrame(
        [(["x", "y", "z"],), (["x", "y", "z"],), (["p", "q"],)],
        "t array<string>",
    )
    sig = minhash_signature("t", 16)
    rows = df.select(
        lsh_band_keys(sig, 4, 4).alias("s"),
        lsh_band_keys(sig, 4, 4, compact=True).alias("c"),
    ).collect()
    assert all(isinstance(k, int) for r in rows for k in r["c"])
    assert len(rows[0]["c"]) == 4
    # identical token sets agree on every key in both forms
    assert rows[0]["s"] == rows[1]["s"] and rows[0]["c"] == rows[1]["c"]
    # per-band collision structure is identical across forms
    for a in rows:
        for b in rows:
            for i in range(4):
                assert (a["s"][i] == b["s"][i]) == (a["c"][i] == b["c"][i])


def test_simhash_near_duplicates_close(spark):
    df = spark.createDataFrame(
        [
            ("doc1", "the quick brown fox jumps over the lazy dog today"),
            ("doc2", "the quick brown fox jumps over the lazy cat today"),
            ("doc3", "completely different words about spark query engines"),
        ],
        "id string, t string",
    )
    fp = df.select("id", simhash64(words("t")).alias("fp"))
    fps = {r["id"]: r["fp"] for r in fp.collect()}
    near = df.sparkSession.createDataFrame(
        [(fps["doc1"], fps["doc2"]), (fps["doc1"], fps["doc3"])], "a long, b long"
    )
    h = [r["h"] for r in near.select(hamming64("a", "b").alias("h")).collect()]
    assert h[0] < h[1]
    assert h[0] <= 12


def test_rolling_fingerprint_portable_arithmetic(spark):
    """Same polynomial arithmetic as any-SQL-engine implementation."""
    def oracle(s: str, base=31, mod=(1 << 31) - 1) -> int:
        acc = 0
        for ch in s:
            acc = (acc * base + ord(ch)) % mod
        return acc

    samples = ["", "a", "hello world", "Zebra!"]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [r["f"] for r in df.select(rolling_fingerprint("t").alias("f")).collect()]
    assert got == [oracle(s) for s in samples]


def test_simhash_reduce_chunking_parity():
    """The chunked batch reduction (ADVICE r02: bound the transient bit
    matrix) is bit-identical to the unchunked path and the scalar
    reference at any chunk size, including caps smaller than single
    rows."""
    import numpy as np

    from entity_linking_spark.functions.hashing import (
        _simhash_fp_scalar,
        _simhash_reduce_batch,
    )
    import pandas as pd

    rng = np.random.RandomState(7)
    rows = [
        rng.randint(-(2**62), 2**62, size=n).tolist()
        for n in [0, 1, 3, 17, 64, 200, 5, 0, 33]
    ]
    rows[3] = None  # null row
    s = pd.Series(rows, dtype=object)
    full = _simhash_reduce_batch(s, max_chunk_tokens=10**9)
    for cap in (1, 2, 16, 100, 10**9):
        got = _simhash_reduce_batch(s, max_chunk_tokens=cap)
        assert got.tolist() == full.tolist(), cap
    expect = [_simhash_fp_scalar(r) for r in rows]
    assert full.tolist() == expect
