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
    # prefix filtering is a pure candidate-generation optimization: the
    # result set must be IDENTICAL with it off (any-shared-token mode)
    unfiltered = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "id", "text", n=3, threshold=0.5, prefix_filter=False
        ).collect()
    }
    assert unfiltered == got


def test_ngram_jaccard_prefix_filter_word_tokens(spark):
    """Prefix-filter recall check on word tokens with many near-threshold
    pairs (threshold boundary cases stress the ceil() prefix length)."""
    import itertools

    base = ["alpha bravo charlie delta echo foxtrot golf hotel",
            "alpha bravo charlie delta echo foxtrot golf india",
            "alpha bravo charlie delta echo foxtrot juliett kilo",
            "lima mike november oscar papa quebec romeo sierra",
            "lima mike november oscar papa quebec romeo tango",
            "uniform victor whiskey xray yankee zulu alpha bravo"]
    rows = [(f"w{i:02d}", t) for i, t in enumerate(base)]
    df = spark.createDataFrame(rows, "id string, text string")
    for thr in (0.5, 0.7, 0.9):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                df, "id", "text", threshold=thr, tokenizer="word"
            ).collect()
        }
        expect = {}
        for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
            sa, sb = set(ta.split()), set(tb.split())
            jac = len(sa & sb) / len(sa | sb)
            if jac >= thr:
                expect[(ia, ib)] = jac
        assert set(got) == set(expect), f"threshold {thr}"
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


def test_line_dedup_pairs_and_guard(spark):
    """Docs sharing ≥2 normalized lines pair up; a line present in more
    than max_doc_freq docs is excluded from pairing (boilerplate guard)
    but surfaced by boilerplate_lines."""
    from entity_linking_spark.operators.dedup import boilerplate_lines, line_dedup_pairs

    hot = "shared sitewide footer"
    rows = []
    # docs 0-3: two common template lines + a unique line each
    for i in range(4):
        rows.append((i, f"template line alpha\ntemplate line beta\nunique line {i:03d}\n{hot}"))
    # docs 4-9: only the hot line + a unique line
    for i in range(4, 10):
        rows.append((i, f"unique line {i:03d}\n{hot}"))
    df = spark.createDataFrame(rows, "id long, text string")

    pairs = line_dedup_pairs(
        df, "id", "text", min_shared_lines=2, min_line_chars=5, max_doc_freq=5
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["n_shared"] for r in pairs}
    # only 0-3 share ≥2 non-hot lines (the hot line is in 10 > 5 docs)
    assert got == {(a, b): 2 for a in range(4) for b in range(a + 1, 4)}
    jac = {(r["id_a"], r["id_b"]): r["line_jaccard"] for r in pairs}
    # each doc 0-3 has 4 distinct lines; shared=2 → 2/(4+4-2)
    for v in jac.values():
        assert abs(v - 2 / 6) < 1e-9

    boiler = {
        r["line"]: r["n_docs"]
        for r in boilerplate_lines(df, "id", "text", min_docs=5, min_line_chars=5).collect()
    }
    assert boiler == {hot: 10}


def test_line_dedup_normalizes_lines(spark):
    """Case/whitespace variants of a line must match."""
    from entity_linking_spark.operators.dedup import line_dedup_pairs

    df = spark.createDataFrame(
        [
            (1, "The  Quick  Brown Fox\nsecond common line\nonly in one"),
            (2, "the quick brown fox\nSECOND   COMMON LINE\nanother tail"),
        ],
        "id long, text string",
    )
    pairs = line_dedup_pairs(df, "id", "text", min_shared_lines=2, min_line_chars=5).collect()
    assert len(pairs) == 1 and pairs[0]["n_shared"] == 2


def test_parallelize_scan_guard(spark):
    from entity_linking_spark.operators.dedup import _parallelize_scan

    p = spark.sparkContext.defaultParallelism
    one = spark.createDataFrame(DOCS, "id string, text string").coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    widened = _parallelize_scan(one)
    assert widened.rdd.getNumPartitions() == p
    # rows survive the repartition untouched
    assert sorted(r["id"] for r in widened.collect()) == sorted(d[0] for d in DOCS)
    # an input already at >= parallelism partitions passes through as-is
    wide = one.repartition(p + 4)
    assert _parallelize_scan(wide) is wide


def test_incremental_dedup_against_reference(spark, docs):
    from entity_linking_spark.operators.dedup import (
        incremental_dedup,
        minhash_lsh_pairs_against,
    )

    new = spark.createDataFrame(
        [
            ("n1", "the quick brown fox jumps over the lazy dog"),   # = d01/d02
            ("n2", "completely novel text about submarine acoustics"),
        ],
        "id string, text string",
    )
    pairs = {
        (r["new_id"], r["ref_id"])
        for r in minhash_lsh_pairs_against(
            new, docs, "id", "text", shingle_k=2, threshold=0.8
        ).collect()
    }
    assert ("n1", "d01") in pairs and ("n1", "d02") in pairs
    assert not any(nid == "n2" for nid, _ in pairs)
    # reference docs are never paired against themselves (bipartite join)
    assert all(nid.startswith("n") for nid, _ in pairs)

    assign = {
        r["id"]: (r["is_novel"], r["matched_ref_id"])
        for r in incremental_dedup(
            new, docs, "id", "text", shingle_k=2, threshold=0.8
        ).collect()
    }
    assert assign["n1"] == (False, "d01")   # min matching ref id
    assert assign["n2"] == (True, None)
