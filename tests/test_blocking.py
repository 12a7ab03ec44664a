"""Blocking recall vs the exhaustive cross-join oracle
(reference src/eval_zeshel.py:44 is the oracle's semantics)."""

import pytest
from pyspark.sql import functions as F

from entity_linking_spark.fixtures import fixture_dataframes, generate_fixture
from entity_linking_spark.functions.text import normalize_text
from entity_linking_spark.operators.blocking import (
    BlockingConfig,
    blocking_keys,
    blocking_recall,
    candidate_pairs,
    exhaustive_pairs,
)


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    fx = generate_fixture(num_pages=60, num_entities=30, seed=42)
    return fixture_dataframes(spark, fx)


def _keys(spark, fixture_dfs, conf):
    pages, mentions, entities, _ = fixture_dfs
    m = mentions.select("mention_id", normalize_text("surface").alias("s"))
    e = entities.select("entity_id", normalize_text("title").alias("s"))
    mk = blocking_keys(m, "mention_id", "s", conf)
    ek = blocking_keys(e, "entity_id", "s", conf)
    return mk, ek


def test_blocking_recall_is_total_on_fixture(spark, fixture_dfs):
    _, mentions, _, _ = fixture_dfs
    conf = BlockingConfig()
    mk, ek = _keys(spark, fixture_dfs, conf)
    pairs = candidate_pairs(mk, ek, conf)
    truth = mentions.select("mention_id", "entity_id")
    assert blocking_recall(pairs, truth) >= 0.99


def test_candidates_are_subset_of_exhaustive(spark, fixture_dfs):
    _, mentions, entities, _ = fixture_dfs
    conf = BlockingConfig()
    mk, ek = _keys(spark, fixture_dfs, conf)
    pairs = candidate_pairs(mk, ek, conf)
    exh = exhaustive_pairs(mentions, entities)
    assert pairs.join(exh, ["mention_id", "entity_id"], "left_anti").count() == 0
    # and is meaningfully sub-quadratic
    assert pairs.count() < exh.count() * 0.5


def test_salting_does_not_change_pair_set(spark, fixture_dfs):
    """Explicit hot-key salting is a pure physical rewrite: with
    hot_threshold=0 every key goes down the salted path and the logical
    pair set must be identical."""
    base = BlockingConfig(hot_threshold=10**9)     # nothing salted
    salted = BlockingConfig(hot_threshold=0)       # everything salted
    mk, ek = _keys(spark, fixture_dfs, base)
    p1 = candidate_pairs(mk, ek, base).select("mention_id", "entity_id")
    p2 = candidate_pairs(mk, ek, salted).select("mention_id", "entity_id")
    assert p1.exceptAll(p2).count() == 0
    assert p2.exceptAll(p1).count() == 0


def test_stop_key_cap_drops_hot_keys(spark):
    m = spark.createDataFrame(
        [(f"m{i}", "aaaa bbbb") for i in range(5)], "mention_id string, s string"
    )
    e = spark.createDataFrame(
        [(f"e{i}", "aaaa bbbb") for i in range(50)], "entity_id string, s string"
    )
    conf = BlockingConfig(max_key_freq=10)
    from entity_linking_spark.operators.blocking import blocking_keys as bk

    pairs = candidate_pairs(
        bk(m, "mention_id", "s", conf), bk(e, "entity_id", "s", conf), conf
    )
    assert pairs.count() == 0  # every key exceeds the stop-key cap
