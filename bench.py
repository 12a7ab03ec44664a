"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

--scaling mode (north rule two-cluster-size proxy): runs the blocking +
scoring hot path of the record-linkage pipeline at local[8] and local[32]
in separate JVMs (subprocesses) on identical input, reports pairs/sec at
both parallelism levels and efficiency = r32 / (4 · r8), and writes
BENCH/BASELINE.md.

--probe is the internal single-run mode used by --scaling.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
FIXTURE_DIR = os.environ.get("SPARK_GRAFT_FIXTURE_DIR", "/tmp/el_bench_fixture")


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def ensure_bench_fixture(spark, pages: int = 3000, entities: int = 300) -> str:
    """Deterministic EL fixture parquet shared by bench + scaling probes."""
    marker = os.path.join(FIXTURE_DIR, f"_done_{pages}_{entities}")
    if not os.path.exists(marker):
        from entity_linking_spark.fixtures import fixture_dataframes, generate_fixture

        shutil.rmtree(FIXTURE_DIR, ignore_errors=True)
        fx = generate_fixture(num_pages=pages, num_entities=entities, seed=42)
        pg, me, en, _ = fixture_dataframes(spark, fx)
        pg.write.mode("overwrite").parquet(os.path.join(FIXTURE_DIR, "pages"))
        me.write.mode("overwrite").parquet(os.path.join(FIXTURE_DIR, "mentions"))
        en.write.mode("overwrite").parquet(os.path.join(FIXTURE_DIR, "entities"))
        open(marker, "w").close()
    return FIXTURE_DIR


def el_hot_path(spark, fixture_dir: str):
    """Blocking + scoring + top-1 edges + CC — the pipeline hot path.
    Returns (n_scored_pairs, n_edges)."""
    from pyspark.sql import functions as F

    from entity_linking_spark.operators.blocking import (
        BlockingConfig, blocking_keys, candidate_pairs,
    )
    from entity_linking_spark.operators.cluster import connected_components
    from entity_linking_spark.operators.scoring import ScoringConfig, score_pairs
    from entity_linking_spark.operators.topk import top_k_per_group
    from entity_linking_spark.plans.pipeline import prepare_entities, prepare_mentions

    pages = spark.read.parquet(os.path.join(fixture_dir, "pages")).select("url", "text")
    mentions = spark.read.parquet(os.path.join(fixture_dir, "mentions"))
    entities = spark.read.parquet(os.path.join(fixture_dir, "entities"))

    m_prep = prepare_mentions(pages, mentions, 32).persist()
    e_prep = prepare_entities(entities).persist()
    bconf = BlockingConfig()
    m_prep.count()
    e_prep.count()
    cands = candidate_pairs(
        blocking_keys(m_prep, "mention_id", "norm_surface", bconf),
        blocking_keys(e_prep, "entity_id", "norm_title", bconf),
        bconf,
    ).persist()
    pairs = cands.join(
        m_prep.select(
            "mention_id",
            F.col("norm_surface").alias("surf_a"),
            F.col("embedding").alias("emb_a"),
        ),
        "mention_id",
    ).join(
        e_prep.select(
            "entity_id",
            F.col("norm_title").alias("surf_b"),
            F.col("embedding").alias("emb_b"),
        ),
        "entity_id",
    )
    scored = score_pairs(pairs, conf=ScoringConfig()).persist()
    n_pairs = scored.count()
    top1 = top_k_per_group(scored, ["mention_id"], "score", 1, ["entity_id"])
    edges = top1.where(F.col("score") >= 0.75).select(
        F.col("mention_id").alias("src"), F.col("entity_id").alias("dst")
    )
    n_edges = connected_components(edges).count()
    return n_pairs, n_edges


def run_headline(cores: int) -> dict:
    from entity_linking_spark.session import get_spark

    spark = get_spark(app_name="el-bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    fixture = ensure_bench_fixture(spark)
    timings: dict[str, float] = {}

    t0 = time.time()
    n_pairs, n_edges = el_hot_path(spark, fixture)
    timings["el_pipeline"] = round(time.time() - t0, 3)

    headline = [
        "denormalize_join",
        "topk_per_group",
        "retrieval_rate",
        "ann_topk",
        "exact_dedup",
        "minhash_dedup",
        "simhash_dedup",
        "token_stats",
        "fingerprint",
        "connected_components",
        "events_hourly",
    ]
    qmap = entrymod.queries()
    for name in headline:
        t0 = time.time()
        df = qmap[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        "cores": cores,
        "el_scored_pairs": n_pairs,
        "el_cc_nodes": n_edges,
    }
    spark.stop()
    return out


def run_probe(cores: int) -> dict:
    """One scaling-probe run: EL hot path only, timed, in this JVM."""
    from entity_linking_spark.session import get_spark

    spark = get_spark(app_name=f"el-scale-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    fixture = ensure_bench_fixture(spark)
    # warm-up: JVM + Arrow worker startup excluded from the measurement
    spark.read.parquet(os.path.join(fixture, "mentions")).count()
    t0 = time.time()
    n_pairs, _ = el_hot_path(spark, fixture)
    wall = time.time() - t0
    spark.stop()
    return {"cores": cores, "wall_sec": round(wall, 3),
            "pairs": n_pairs, "pairs_per_sec": round(n_pairs / wall, 1)}


def run_scaling() -> dict:
    # fixture built once in a throwaway session so probes measure compute only
    from entity_linking_spark.session import get_spark

    spark = get_spark(app_name="el-fixture", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_bench_fixture(spark)
    spark.stop()

    results = {}
    for cores in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe"],
            env=env, capture_output=True, text=True, check=True,
        )
        results[cores] = json.loads(out.stdout.strip().splitlines()[-1])

    r8 = results[8]["pairs_per_sec"]
    r32 = results[32]["pairs_per_sec"]
    eff = round(r32 / (4 * r8), 3)
    report = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": eff,
        "unit": "ratio",
        "probe_8": results[8],
        "probe_32": results[32],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE — throughput & scaling efficiency\n\n"
            "North-rule two-cluster-size criterion, sandbox proxy: the same\n"
            "blocking+scoring+clustering job at local[8] and local[32] on\n"
            "identical input (deterministic EL fixture, seed=42).\n\n"
            "| parallelism | wall sec | scored pairs | pairs/sec |\n"
            "|---|---|---|---|\n"
            f"| local[8] | {results[8]['wall_sec']} | {results[8]['pairs']} | {r8} |\n"
            f"| local[32] | {results[32]['wall_sec']} | {results[32]['pairs']} | {r32} |\n\n"
            f"**Scaling efficiency (8→32 cores) = r32 / (4·r8) = {eff}**"
            f" (target ≥ 0.8)\n\n"
            "Reference publishes no throughput numbers (BASELINE.md) — the\n"
            "quality baseline (retrieval rate / F1) is covered by pytest\n"
            "gates (tests/test_pipeline.py) and CORRECTNESS queries.\n"
        )
    return report


def main() -> None:
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--probe" in sys.argv:
        print(json.dumps(run_probe(CPUS)))
    else:
        print(json.dumps(run_headline(CPUS)))


if __name__ == "__main__":
    main()
