"""Scoring-path equivalence: the three physical plans (array-column UDF
path, fused binary-embedding UDF, broadcast-indexed scorer) must produce
the same cosine/jaro_winkler/lev_sim/score for the same pairs — they are
alternative physical strategies for one semantic (SURVEY.md §2.9 U4,
reference src/eval_zeshel.py:44 dot-product scoring + north-rule JW/lev).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_linking_spark.functions.encoder import embed_text, embed_text_binary
from entity_linking_spark.operators.scoring import (
    ScoringConfig,
    score_pairs,
    score_pairs_broadcast,
)

SURFACES_A = [
    "crimson falcon society", "gilded harbor", "silent citadel",
    "falcon crimson society", "amber meridian inst", "", "solo",
]
SURFACES_B = [
    "crimson falcon society", "gilded harbour", "silent citadel x",
    "crimson falcon society", "amber meridian institute", "empty", "solo",
]


@pytest.fixture(scope="module")
def pair_inputs(spark):
    rows = [(f"m{i}", a, f"e{i}", b) for i, (a, b) in enumerate(zip(SURFACES_A, SURFACES_B))]
    df = spark.createDataFrame(rows, "mention_id string, surf_a string, entity_id string, surf_b string")
    return df.persist()


def _collect_scores(df):
    out = {}
    for r in df.collect():
        out[(r["mention_id"], r["entity_id"])] = (
            r["cosine"], r["jaro_winkler"], r["lev_sim"], r["score"]
        )
    return out


def test_fused_binary_matches_array_path(spark, pair_inputs):
    arr = pair_inputs.withColumns(
        {"emb_a": embed_text("surf_a"), "emb_b": embed_text("surf_b")}
    )
    binry = pair_inputs.withColumns(
        {"emb_a": embed_text_binary("surf_a"), "emb_b": embed_text_binary("surf_b")}
    )
    conf = ScoringConfig()
    s_arr = _collect_scores(score_pairs(arr, conf=conf))
    s_bin = _collect_scores(score_pairs(binry, conf=conf))  # dispatches to fused
    assert s_arr.keys() == s_bin.keys()
    for k in s_arr:
        np.testing.assert_allclose(s_arr[k], s_bin[k], atol=1e-6, err_msg=str(k))


def test_fused_binary_order_sensitive_matches_array_path(spark, pair_inputs):
    """token_order_invariant=False with binary embeddings must dispatch to
    the fused path (not the JVM zip_with fallback, which raises on
    BinaryType — ADVICE r01 #3) and agree with the array path."""
    arr = pair_inputs.withColumns(
        {"emb_a": embed_text("surf_a"), "emb_b": embed_text("surf_b")}
    )
    binry = pair_inputs.withColumns(
        {"emb_a": embed_text_binary("surf_a"), "emb_b": embed_text_binary("surf_b")}
    )
    conf = ScoringConfig()
    s_arr = _collect_scores(score_pairs(arr, conf=conf, token_order_invariant=False))
    s_bin = _collect_scores(score_pairs(binry, conf=conf, token_order_invariant=False))
    assert s_arr.keys() == s_bin.keys()
    for k in s_arr:
        np.testing.assert_allclose(s_arr[k], s_bin[k], atol=1e-6, err_msg=str(k))
    # the token-swapped pair must score LOWER than under order-invariance
    inv = _collect_scores(score_pairs(binry, conf=conf, token_order_invariant=True))
    swapped = ("m3", "e3")  # "falcon crimson society" vs "crimson falcon society"
    assert s_bin[swapped][1] < inv[swapped][1]


def test_broadcast_indexed_matches_fused(spark, pair_inputs):
    m_feat = pair_inputs.select(
        "mention_id", F.col("surf_a").alias("norm_surface")
    ).withColumn("embedding", embed_text_binary("norm_surface"))
    e_feat = pair_inputs.select(
        "entity_id", F.col("surf_b").alias("norm_title")
    ).withColumn("embedding", embed_text_binary("norm_title"))
    cands = pair_inputs.select("mention_id", "entity_id")
    conf = ScoringConfig()

    s_bc = _collect_scores(
        score_pairs_broadcast(cands, m_feat, e_feat, conf=conf)
    )

    fused_in = (
        cands.join(
            m_feat.select("mention_id", F.col("norm_surface").alias("surf_a"),
                          F.col("embedding").alias("emb_a")), "mention_id")
        .join(
            e_feat.select("entity_id", F.col("norm_title").alias("surf_b"),
                          F.col("embedding").alias("emb_b")), "entity_id")
    )
    s_fused = _collect_scores(score_pairs(fused_in, conf=conf))
    assert s_bc.keys() == s_fused.keys()
    for k in s_bc:
        np.testing.assert_allclose(s_bc[k], s_fused[k], atol=1e-6, err_msg=str(k))


def test_golden_values(spark, pair_inputs):
    """Identical strings: cosine=1, jw=1, lev=1, score=1 (unit weights sum)."""
    binry = pair_inputs.withColumns(
        {"emb_a": embed_text_binary("surf_a"), "emb_b": embed_text_binary("surf_b")}
    )
    scored = {r["mention_id"]: r for r in score_pairs(binry).collect()}
    exact = scored["m0"]  # identical surfaces
    assert exact["cosine"] == pytest.approx(1.0, abs=1e-6)
    assert exact["jaro_winkler"] == pytest.approx(1.0)
    assert exact["lev_sim"] == pytest.approx(1.0)
    assert exact["score"] == pytest.approx(1.0, abs=1e-6)
    # token-swapped alias: order-invariant JW/lev must be 1.0
    swapped = scored["m3"]
    assert swapped["jaro_winkler"] == pytest.approx(1.0)
    assert swapped["lev_sim"] == pytest.approx(1.0)
