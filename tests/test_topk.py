"""Retrieval-rate harness golden — mirrors reference src/eval_zeshel.py:38-53
(FIXTURES.md §6: 4 mentions × 6 entities with known top-k outcomes)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators.topk import (
    rank_of_true,
    retrieval_rates,
    top_k_per_group,
)

ENTITIES = [f"e{i}" for i in range(6)]
# score matrix: rows = mentions m0..m3, cols = entities e0..e5
SCORES = np.array(
    [
        [0.9, 0.1, 0.2, 0.3, 0.4, 0.5],   # m0 true=e0 → rank 1
        [0.8, 0.9, 0.1, 0.2, 0.3, 0.4],   # m1 true=e0 → rank 2
        [0.1, 0.2, 0.3, 0.4, 0.5, 0.6],   # m2 true=e0 → rank 6
        [0.5, 0.5, 0.5, 0.5, 0.5, 0.5],   # m3 true=e2 → tie → rank 3 (id asc)
    ]
)
TRUE = {"m0": "e0", "m1": "e0", "m2": "e0", "m3": "e2"}


def reference_retrieval_rate(k: int) -> float:
    """Direct port of reference compute_retrieval_rate semantics
    (src/eval_zeshel.py:44-53), argsort ties broken by index."""
    n = 0
    for i, mid in enumerate(["m0", "m1", "m2", "m3"]):
        order = np.argsort(SCORES[i])[::-1][:k]
        if TRUE[mid] in [ENTITIES[j] for j in order]:
            n += 1
    return n / 4


@pytest.fixture(scope="module")
def scored(spark):
    rows = []
    for i, mid in enumerate(["m0", "m1", "m2", "m3"]):
        for j, eid in enumerate(ENTITIES):
            rows.append((mid, eid, float(SCORES[i][j]), TRUE[mid]))
    return spark.createDataFrame(
        rows, "mention_id string, entity_id string, score double, true_entity_id string"
    )


def test_rank_of_true(scored):
    got = {r["mention_id"]: r["true_rank"] for r in rank_of_true(scored).collect()}
    assert got == {"m0": 1, "m1": 2, "m2": 6, "m3": 3}


def test_retrieval_rates_match_reference_semantics(scored):
    row = retrieval_rates(scored, ks=(1, 2, 4, 6)).collect()[0]
    # note: on ties numpy argsort order differs from our explicit id-asc
    # tie-break, but rates at these k values agree for this golden matrix
    assert row["retrieval_rate_k1"] == pytest.approx(reference_retrieval_rate(1))
    assert row["retrieval_rate_k4"] == pytest.approx(reference_retrieval_rate(4))
    assert row["retrieval_rate_k6"] == pytest.approx(1.0)


def test_top_k_per_group_deterministic_ties(scored):
    top2 = top_k_per_group(scored, ["mention_id"], "score", 2, ["entity_id"])
    m3 = sorted(
        r["entity_id"] for r in top2.where(F.col("mention_id") == "m3").collect()
    )
    assert m3 == ["e0", "e1"]  # all tied → id-asc tie-break
