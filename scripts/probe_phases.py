"""Phase-level timing of the EL hot path (diagnostic, not a gate).

Splits the scaling probe's timed region into prepare / broadcast-build /
blocking / scoring so BENCH/BASELINE.md's shuffle-vs-compute analysis is
measured, not inferred.  Run: SPARK_GRAFT_CPUS=N python scripts/probe_phases.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from entity_linking_spark.session import get_spark  # noqa: E402


def timed_phases(spark, fixture_dir: str) -> dict:
    from entity_linking_spark.operators.blocking import (
        BlockingConfig, blocking_keys, candidate_pairs,
    )
    from entity_linking_spark.operators.scoring import (
        ScoringConfig, build_feature_broadcast, score_indexed_pairs,
    )
    from entity_linking_spark.plans.pipeline import prepare_entities, prepare_mentions

    t: dict[str, float] = {}
    pages = spark.read.parquet(os.path.join(fixture_dir, "pages")).select("url", "text")
    mentions = spark.read.parquet(os.path.join(fixture_dir, "mentions"))
    entities = spark.read.parquet(os.path.join(fixture_dir, "entities"))

    t0 = time.time()
    m_prep = prepare_mentions(pages, mentions, 32).persist()
    e_prep = prepare_entities(entities).persist()
    m_prep.count(); e_prep.count()
    t["prepare"] = time.time() - t0

    t0 = time.time()
    ba, m_idx = build_feature_broadcast(m_prep, "mention_id")
    bb, e_idx = build_feature_broadcast(e_prep, "entity_id")
    m_feat = (
        m_prep.join(F.broadcast(m_idx), "mention_id")
        .select(F.col("idx").alias("idx_a"), F.col("norm_surface").alias("surf_a"))
        .persist()
    )
    e_feat = (
        e_prep.join(F.broadcast(e_idx), "entity_id")
        .select(F.col("idx").alias("idx_b"), F.col("norm_title").alias("surf_b"))
        .persist()
    )
    m_feat.count(); e_feat.count()
    t["broadcast_build"] = time.time() - t0

    bconf = BlockingConfig(compact_keys=True)
    t0 = time.time()
    cands = candidate_pairs(
        blocking_keys(m_feat, "idx_a", "surf_a", bconf),
        blocking_keys(e_feat, "idx_b", "surf_b", bconf),
        bconf,
    ).select(
        F.col("mention_id").alias("idx_a"), F.col("entity_id").alias("idx_b")
    ).persist()
    n_pairs = cands.count()
    t["blocking"] = time.time() - t0

    t0 = time.time()
    pairs = cands.join(F.broadcast(m_feat), "idx_a").join(F.broadcast(e_feat), "idx_b")
    scored = score_indexed_pairs(pairs, ba, bb, conf=ScoringConfig()).select(
        (F.col("idx_a") * 2).alias("mention_id"),
        (F.col("idx_b") * 2 + 1).alias("entity_id"),
        "score",
    )
    scored.write.format("noop").mode("overwrite").save()
    t["scoring"] = time.time() - t0
    t["pairs"] = n_pairs
    return t


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name=f"phase-probe-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    fixture = bench.ensure_bench_fixture(
        spark, pages=bench.SCALE_PAGES, entities=bench.SCALE_ENTITIES
    )
    warm = timed_phases(spark, fixture)           # warm-up pass
    spark.catalog.clearCache()
    hot = timed_phases(spark, fixture)            # steady state
    print(json.dumps({"cores": cores, "warm": warm, "steady": hot}))
    spark.stop()


if __name__ == "__main__":
    main()
