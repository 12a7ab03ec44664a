"""ANN: brute-force exactness vs numpy; LSH recall on clustered vectors."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators.ann import brute_force_topk, lsh_topk

DIM = 16


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(3)
    centers = rng.standard_normal((5, DIM)) * 3
    rows = []
    for i in range(100):
        c = i % 5
        v = centers[c] + rng.standard_normal(DIM) * 0.1
        v = v / np.linalg.norm(v)
        rows.append((f"v{i:03d}", c, [float(x) for x in v]))
    return spark.createDataFrame(rows, "id string, label int, embedding array<float>")


def numpy_topk(rows, k):
    ids = [r[0] for r in rows]
    mat = np.array([r[2] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    out = {}
    for i, qid in enumerate(ids):
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-sims[i, j], ids[j]),
        )[:k]
        out[qid] = [ids[j] for j in order]
    return out


def test_brute_force_matches_numpy(spark, vec_df):
    rows = [(r["id"], r["label"], r["embedding"]) for r in vec_df.collect()]
    want = numpy_topk(rows, 3)
    got_df = brute_force_topk(
        vec_df.select(F.col("id").alias("query_id"), "embedding"),
        vec_df.select(F.col("id").alias("corpus_id"), "embedding"),
        k=3,
    )
    got = {}
    for r in got_df.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["corpus_id"]))
    got = {q: [c for _, c in sorted(v)] for q, v in got.items()}
    assert got == want


def test_lsh_topk_recall(spark, vec_df):
    """LSH top-1 must agree with exact top-1 for most queries on strongly
    clustered vectors (same-cluster neighbors share buckets)."""
    q = vec_df.select(F.col("id").alias("query_id"), "embedding")
    c = vec_df.select(F.col("id").alias("corpus_id"), "embedding")
    exact = {
        r["query_id"]: r["corpus_id"]
        for r in brute_force_topk(q, c, k=1).collect()
    }
    approx = {
        r["query_id"]: r["corpus_id"]
        for r in lsh_topk(q, c, dim=DIM, k=1, num_planes=4, num_tables=8).collect()
    }
    hits = sum(1 for k in exact if approx.get(k) == exact[k])
    assert hits / len(exact) >= 0.9
