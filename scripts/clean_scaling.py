"""Two-parallelism scaling probe for the corpus-cleaning composition
(plans/corpus_clean.py) — the north rule's two-cluster-size criterion
applied to the r5 hygiene surface, same sandbox proxy as bench.py
--scaling: the SAME job at local[8] vs local[32] on the SAME input,
interleaved arms (A/B/A/B) so box drift hits both arms equally.

Child mode (--cores N): one fresh-JVM run — warm pass, then REPS timed
passes of clean_corpus over the sf0.1 documents (planted URL column,
1%-slice benchmark), prints one JSON line.
Parent mode (default): interleaves the two arms, reports medians and
efficiency r32 / (4 · r8); paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_CLEAN_REPS", "2"))
# sf0.1's 5000 docs are OVERHEAD-bound for this 7-stage composition (the
# first probe measured 32-core wall == 8-core wall: per-stage scheduling
# and codegen dwarf 5000 rows of compute).  Replicate each doc AMP times
# with a per-replica token perturbation — replicas survive exact dedup,
# become genuine near-dup work for the MinHash/CC stages, and push the
# probe into the compute-bound regime the criterion is about.
AMP = int(os.environ.get("SPARK_GRAFT_CLEAN_AMP", "8"))


def one_pass(spark):
    from pyspark.sql import functions as F

    from entity_linking_spark.operators._cache import cache_scope
    from entity_linking_spark.plans.corpus_clean import (
        CleanConfig, clean_corpus,
    )

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    reps = spark.range(AMP).withColumnRenamed("id", "rep")
    docs = base.crossJoin(reps).select(
        (F.col("doc_id") * AMP + F.col("rep")).alias("id"),
        F.concat(
            F.lit("http://ex.org/p"), (F.col("doc_id") % 4000).cast("string"),
            F.lit("?r"), F.col("rep").cast("string"),
            F.lit("&utm_source=x"),
        ).alias("url"),
        F.concat(
            F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
        ).alias("text"),
    )
    bench = docs.select("id", "text").where(F.col("id") % 100 == 0)
    with cache_scope():
        _, report = clean_corpus(
            docs, bench, CleanConfig(min_tokens=5, line_min_docs=5)
        )
    return report


def child(cores: int) -> None:
    from entity_linking_spark.session import get_spark

    spark = get_spark(app_name="clean-scaling", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    report = one_pass(spark)  # warm: codegen/JIT/worker spawn
    walls = []
    for _ in range(REPS):
        t0 = time.time()
        report = one_pass(spark)
        walls.append(round(time.time() - t0, 3))
    rows_in = report["rows_in"]
    med = statistics.median(walls)
    print(json.dumps({
        "cores": cores, "walls": walls, "median_wall": med,
        "rows_in": rows_in, "rows_out": report["rows_out"],
        "rows_per_sec": round(rows_in / med, 1), "report": report,
    }))
    spark.stop()


def parent() -> None:
    runs: dict[int, list[dict]] = {8: [], 32: []}
    for _rep in range(2):               # interleave fresh-JVM arms
        for cores in (8, 32):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cores",
                 str(cores)],
                env=env, capture_output=True, text=True, check=True,
            )
            runs[cores].append(json.loads(out.stdout.strip().splitlines()[-1]))
    med = {c: statistics.median(
        w for r in rs for w in r["walls"]) for c, rs in runs.items()}
    r8 = runs[8][0]["rows_in"] / med[8]
    r32 = runs[32][0]["rows_in"] / med[32]
    print(json.dumps({
        "metric": "clean_corpus_scaling_8_to_32",
        "value": round(r32 / (4 * r8), 3),
        "unit": "ratio",
        "median_wall_8": med[8], "median_wall_32": med[32],
        "all_walls_8": [w for r in runs[8] for w in r["walls"]],
        "all_walls_32": [w for r in runs[32] for w in r["walls"]],
        "rows_in": runs[8][0]["rows_in"],
        "report": runs[8][0]["report"],
    }))


if __name__ == "__main__":
    if "--cores" in sys.argv:
        child(int(sys.argv[sys.argv.index("--cores") + 1]))
    else:
        parent()
