"""Dedup suite: exact / n-gram Jaccard / MinHash-LSH / SimHash."""

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators.dedup import (
    dedup_assignment,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

DOCS = [
    ("d01", "the quick brown fox jumps over the lazy dog"),
    ("d02", "the quick brown fox jumps over the lazy dog"),        # exact dup of d01
    ("d03", "the quick brown fox jumps over the lazy cat"),        # near dup
    ("d04", "spark engines shuffle partitions across the cluster"),
    ("d05", "spark engines shuffle partitions across the cluster"),  # exact dup of d04
    ("d06", "entirely unrelated content about gardening and tulips"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "id string, text string")


def test_exact_dedup(docs):
    kept = exact_dedup(docs, "id", "text")
    rows = {r["id"]: r["dup_count"] for r in kept.collect()}
    assert rows == {"d01": 2, "d03": 1, "d04": 2, "d06": 1}


def python_jaccard(a: str, b: str) -> float:
    sa, sb = set(a.split()), set(b.split())
    return len(sa & sb) / len(sa | sb)


def test_ngram_jaccard_pairs_match_bruteforce(spark, docs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "id", "text", n=3, threshold=0.5).collect()
    }
    # brute force on char 3-grams
    def grams(s):
        return {s[i : i + 3] for i in range(max(len(s) - 2, 1))}

    ids = dict(DOCS)
    expect = {}
    keys = sorted(ids)
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            a, b = ids[keys[i]], ids[keys[j]]
            ga, gb = grams(a), grams(b)
            jac = len(ga & gb) / len(ga | gb)
            if jac >= 0.5:
                expect[(keys[i], keys[j])] = jac
    assert set(got) == set(expect)
    for k in got:
        assert got[k] == pytest.approx(expect[k])


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, "id", "text", shingle_k=2, num_hashes=64, bands=16, threshold=0.6
        ).collect()
    }
    assert ("d01", "d02") in pairs
    assert ("d04", "d05") in pairs
    assert ("d01", "d06") not in pairs


def test_simhash_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]) for r in simhash_pairs(docs, "id", "text", 3).collect()
    }
    assert ("d01", "d02") in pairs
    assert ("d04", "d05") in pairs
    assert ("d01", "d06") not in pairs


def test_dedup_assignment_representatives(docs):
    edges = docs.sparkSession.createDataFrame(
        [("d01", "d02"), ("d02", "d03"), ("d04", "d05")], "id_a string, id_b string"
    )
    got = {r["id"]: r["keep_id"] for r in dedup_assignment(docs, "id", edges).collect()}
    assert got == {
        "d01": "d01", "d02": "d01", "d03": "d01",
        "d04": "d04", "d05": "d04", "d06": "d06",
    }
