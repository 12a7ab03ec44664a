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


def test_null_surface_rows_still_generate_candidates(spark):
    """Records whose surface/title is NULL (dirty web data) must not be
    silently excluded from blocking: they share the NULL→"" sentinel
    gram, so a NULL-surface mention still pairs with a NULL-title
    entity.  Regression for the r5 zip_with rewrite, whose NULL gram
    arrays exploded to zero key rows."""
    m = spark.createDataFrame(
        [(1, None), (2, "acme corp")], "mention_id long, s string"
    )
    e = spark.createDataFrame(
        [(10, None), (20, "acme corp")], "entity_id long, s string"
    )
    for conf in (BlockingConfig(), BlockingConfig(compact_keys=True)):
        mk = blocking_keys(m, "mention_id", "s", conf)
        ek = blocking_keys(e, "entity_id", "s", conf)
        got = {
            (r["mention_id"], r["entity_id"])
            for r in candidate_pairs(mk, ek, conf).collect()
        }
        assert (1, 10) in got, conf
        assert (2, 20) in got, conf


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


def test_entity_heavy_skew_triggers_salting(spark):
    """A key with FEW mentions but MANY entities must still take the
    salted path (ADVICE r01: the old trigger watched the mention side
    only) and the pair set must equal the plain join's."""
    m = spark.createDataFrame(
        [(f"m{i}", "zzzz qqqq") for i in range(3)], "mention_id string, s string"
    )
    e = spark.createDataFrame(
        [(f"e{i}", "zzzz qqqq") for i in range(40)], "entity_id string, s string"
    )
    # entity freq per key ≈ 40 > threshold 20; mention freq 3 < 20
    conf = BlockingConfig(hot_threshold=20, num_salts=4, max_key_freq=None)
    plain = BlockingConfig(hot_threshold=10**9, max_key_freq=None)
    mk = blocking_keys(m, "mention_id", "s", conf)
    ek = blocking_keys(e, "entity_id", "s", conf)
    p_salted = candidate_pairs(mk, ek, conf).select("mention_id", "entity_id")
    p_plain = candidate_pairs(mk, ek, plain).select("mention_id", "entity_id")
    assert p_salted.count() == 3 * 40
    assert p_salted.exceptAll(p_plain).count() == 0
    assert p_plain.exceptAll(p_salted).count() == 0


def test_mixed_skew_both_salted_branches(spark):
    """One mention-heavy key and one entity-heavy key in the same run:
    both salted branches fire and the union equals the plain pair set."""
    m = spark.createDataFrame(
        [(f"m{i}", "aaaa bbbb") for i in range(30)]
        + [(f"n{i}", "cccc dddd") for i in range(2)],
        "mention_id string, s string",
    )
    e = spark.createDataFrame(
        [(f"e{i}", "aaaa bbbb") for i in range(2)]
        + [(f"f{i}", "cccc dddd") for i in range(30)],
        "entity_id string, s string",
    )
    conf = BlockingConfig(hot_threshold=10, num_salts=4, max_key_freq=None)
    plain = BlockingConfig(hot_threshold=10**9, max_key_freq=None)
    mk = blocking_keys(m, "mention_id", "s", conf)
    ek = blocking_keys(e, "entity_id", "s", conf)
    p_salted = candidate_pairs(mk, ek, conf).select("mention_id", "entity_id")
    p_plain = candidate_pairs(mk, ek, plain).select("mention_id", "entity_id")
    assert p_salted.exceptAll(p_plain).count() == 0
    assert p_plain.exceptAll(p_salted).count() == 0
    assert p_salted.count() == 30 * 2 + 2 * 30


def test_compact_keys_same_pair_set(spark, fixture_dfs):
    """compact_keys folds keys to xxhash64 longs; modulo (astronomically
    unlikely) collisions the candidate pair set is identical — and the
    salted path still works on long keys."""
    base = BlockingConfig()
    compact = BlockingConfig(compact_keys=True)
    compact_salted = BlockingConfig(compact_keys=True, hot_threshold=0)
    mk_s, ek_s = _keys(spark, fixture_dfs, base)
    mk_c, ek_c = _keys(spark, fixture_dfs, compact)
    assert dict(mk_c.dtypes)["key"] == "bigint"
    p_str = candidate_pairs(mk_s, ek_s, base).select("mention_id", "entity_id")
    p_cmp = candidate_pairs(mk_c, ek_c, compact).select("mention_id", "entity_id")
    p_slt = candidate_pairs(mk_c, ek_c, compact_salted).select("mention_id", "entity_id")
    assert p_str.exceptAll(p_cmp).count() == 0
    assert p_cmp.exceptAll(p_str).count() == 0
    assert p_cmp.exceptAll(p_slt).count() == 0
    assert p_slt.exceptAll(p_cmp).count() == 0


def test_stage_table_hot_key_mode_pair_parity(spark, tmp_path):
    """catalog-backed hot-key classification (VERDICT r03 #9): the pair
    set must equal the collect-mode one on a mixed-skew input (both
    salted branches live), the key_stats stage must be reused on rerun
    (snapshot unchanged), and the plan must contain NO LocalTableScan
    (the collect-mode signature of driver-collected hot keys)."""
    from entity_linking_spark.sources.catalog import Catalog

    m = spark.createDataFrame(
        [(f"m{i}", "aaaa bbbb") for i in range(30)]
        + [(f"n{i}", "cccc dddd") for i in range(2)],
        "mention_id string, s string",
    )
    e = spark.createDataFrame(
        [(f"e{i}", "aaaa bbbb") for i in range(2)]
        + [(f"f{i}", "cccc dddd") for i in range(30)],
        "entity_id string, s string",
    )
    conf = BlockingConfig(hot_threshold=10, num_salts=4, max_key_freq=None)
    mk = blocking_keys(m, "mention_id", "s", conf)
    ek = blocking_keys(e, "entity_id", "s", conf)
    cat = Catalog(spark, str(tmp_path / "stages"))

    p_stage = candidate_pairs(mk, ek, conf, catalog=cat)
    p_collect = candidate_pairs(mk, ek, conf)
    a = p_stage.select("mention_id", "entity_id")
    b = p_collect.select("mention_id", "entity_id")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() == 30 * 2 + 2 * 30

    # no driver-collected hot keys in the stage-mode plan: collected key
    # lists re-enter the plan as driver-local relations (LocalTableScan /
    # Scan ExistingRDD[key...]); stage mode reads them from the parquet
    # stage instead
    plan = p_stage._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan and "ExistingRDD[key" not in plan
    assert "blocking_key_stats" in plan or "Parquet" in plan
    # the collect-mode plan DOES carry the driver-local key lists
    # (sanity: the assertion above distinguishes the modes)
    collect_plan = p_collect._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in collect_plan or "ExistingRDD[key" in collect_plan

    # rerun reuses the stage: snapshot unchanged
    snap = cat.snapshot_id("blocking_key_stats")
    p_again = candidate_pairs(mk, ek, conf, catalog=cat)
    assert p_again.select("mention_id", "entity_id").exceptAll(a).count() == 0
    assert cat.snapshot_id("blocking_key_stats") == snap


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
