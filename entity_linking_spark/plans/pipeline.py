"""End-to-end record-linkage pipeline with checkpoint/resume.

Stage graph (each stage lands in the catalog; resume skips complete ones):

  pages ──validate extract──┐
  mentions ──⋈ pages──► mentions_prepared (ctx window, norm, embed) ─┐
  entities ──────────► entities_prepared (norm title, embed)        ─┤
                                                                     ▼
                         candidates (salted blocking + MinHash-LSH bands)
                                                                     ▼
                         scored (Arrow UDFs: cosine + JW + Levenshtein)
                                                                     ▼
                         edges (per-mention top-1 ≥ threshold)
                                                                     ▼
                         clusters (large-star/small-star CC)

Reference lineage: transform stage ≅ src/transform_zeshel.py, embed ≅
src/compute_embeddings.py, score/top-k/eval ≅ src/eval_zeshel.py:38-53;
blocking & clustering are the north-rule scale additions.

Embedding inputs mirror the reference's encoders: the mention tower sees
"surface | context window" (src/zeshel_dataset.py:62-91), the entity tower
sees "title | description" (':94-115', title-pipe-text at ':99-100').
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_linking_spark.functions.encoder import embed_text_binary
from entity_linking_spark.functions.extract import extract_text
from entity_linking_spark.functions.text import context_window, normalize_text
from entity_linking_spark.operators.blocking import (
    BlockingConfig,
    blocking_keys,
    blocking_recall,
    candidate_pairs,
)
from entity_linking_spark.operators.cluster import connected_components
from entity_linking_spark.operators.scoring import ScoringConfig, score_pairs
from entity_linking_spark.operators.topk import retrieval_rates, top_k_per_group
from entity_linking_spark.plans.evaluate import (
    PairwiseMetrics,
    pairwise_f1_from_contingency,
    pairwise_f1_from_labeled,
)
from entity_linking_spark.sources.catalog import Catalog


@dataclass
class PipelineConfig:
    workdir: str
    context_size: int = 32
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    scoring: ScoringConfig = field(default_factory=ScoringConfig)
    strict_extract: bool = True
    # Feature tables below this row count score via the broadcast-indexed
    # plan (id pairs + matrix broadcasts — no shuffle of embedding-laden
    # rows); above it, the join-attached fused-UDF plan (web scale).
    broadcast_feature_rows: int = 500_000
    # Catalog-backed blocking (VERDICT r04 stretch #8): the exploded key
    # streams land as stages and candidate_pairs runs in stage-table
    # hot-key mode (key_stats stage, zero driver collect) — a killed run
    # resumes blocking from the checkpointed keys/stats instead of
    # recomputing the MinHash key expressions over the corpus.  False
    # restores the one-shot in-memory mode.
    stage_table_blocking: bool = True


def prepare_mentions(pages: DataFrame, mentions: DataFrame, context_size: int) -> DataFrame:
    """Denormalize mentions against pages (the reference's J1 join,
    src/transform_zeshel.py:13) and compute window + embedding."""
    page_text = pages.select("url", "text")
    joined = mentions.join(page_text, "url", "inner")
    ctx = context_window("text", "start_index", "end_index", context_size)
    prepped = joined.select(
        "mention_id",
        "url",
        "entity_id",
        normalize_text("surface").alias("norm_surface"),
        ctx.alias("context"),
    )
    return prepped.withColumn(
        # packed float32 bytes — feeds the fused scoring UDF
        # (operators/scoring.py:score_pairs_fused)
        "embedding",
        embed_text_binary(F.concat_ws(" | ", "norm_surface", "context")),
    )


def prepare_entities(entities: DataFrame) -> DataFrame:
    return entities.select(
        "entity_id",
        normalize_text("title").alias("norm_title"),
        F.coalesce("text", F.lit("")).alias("text"),
    ).withColumn(
        "embedding",
        embed_text_binary(F.concat_ws(" | ", "norm_title", normalize_text("text"))),
    )


def validate_extraction(pages: DataFrame) -> int:
    """Byte-identical extracted-text invariant (BASELINE.json:input_hint):
    number of pages whose extract(html) != text (must be 0)."""
    return pages.where(extract_text("html") != F.col("text")).count()


def link_entities(
    spark: SparkSession,
    pages: DataFrame,
    mentions: DataFrame,
    entities: DataFrame,
    cfg: PipelineConfig,
    resume: bool = True,
    labeled_pairs: DataFrame | None = None,
) -> dict:
    """Run (or resume) the full pipeline; returns stage DataFrames + metrics."""
    cat = Catalog(spark, cfg.workdir)

    mismatches = validate_extraction(pages)
    if cfg.strict_extract and mismatches:
        raise ValueError(f"extraction invariant violated on {mismatches} pages")

    m_prep = cat.get_or_compute(
        "mentions_prepared",
        lambda: prepare_mentions(pages, mentions, cfg.context_size),
        resume,
    )
    e_prep = cat.get_or_compute(
        "entities_prepared", lambda: prepare_entities(entities), resume
    )

    def compute_candidates() -> DataFrame:
        if cfg.stage_table_blocking:
            # full catalog-backed blocking: key streams + key_stats are
            # resumable stages, classification is distributed (no driver
            # collect) — a rerun after a mid-blocking kill reuses every
            # complete stage and re-scans nothing
            mk = cat.get_or_compute(
                "mention_blocking_keys",
                lambda: blocking_keys(
                    m_prep, "mention_id", "norm_surface", cfg.blocking
                ),
                resume,
            )
            ek = cat.get_or_compute(
                "entity_blocking_keys",
                lambda: blocking_keys(
                    e_prep, "entity_id", "norm_title", cfg.blocking
                ),
                resume,
            )
            return candidate_pairs(
                mk, ek, cfg.blocking, catalog=cat, resume=resume
            )
        mk = blocking_keys(m_prep, "mention_id", "norm_surface", cfg.blocking)
        ek = blocking_keys(e_prep, "entity_id", "norm_title", cfg.blocking)
        return candidate_pairs(mk, ek, cfg.blocking)

    cands = cat.get_or_compute("candidates", compute_candidates, resume)

    def compute_scored() -> DataFrame:
        out_cols = [
            "mention_id", "entity_id", "blocking_key",
            "cosine", "jaro_winkler", "lev_sim", "score",
        ]
        # Plan selection mirrors Catalyst's broadcast-vs-shuffle decision,
        # but at the operator level: dimension-sized feature tables go
        # through the indexed scorer (id-pair stream only).
        if (
            m_prep.count() <= cfg.broadcast_feature_rows
            and e_prep.count() <= cfg.broadcast_feature_rows
        ):
            from entity_linking_spark.operators.scoring import score_pairs_broadcast

            return score_pairs_broadcast(
                cands, m_prep, e_prep, conf=cfg.scoring
            ).select(*out_cols)
        m_side = m_prep.select(
            "mention_id",
            F.col("norm_surface").alias("surf_a"),
            F.col("embedding").alias("emb_a"),
        )
        e_side = e_prep.select(
            "entity_id",
            F.col("norm_title").alias("surf_b"),
            F.col("embedding").alias("emb_b"),
        )
        pairs = cands.join(m_side, "mention_id").join(e_side, "entity_id")
        return score_pairs(pairs, conf=cfg.scoring).select(*out_cols)

    scored = cat.get_or_compute("scored", compute_scored, resume)

    def compute_edges() -> DataFrame:
        top1 = top_k_per_group(
            scored, ["mention_id"], "score", k=1, tiebreak_cols=["entity_id"]
        )
        return top1.where(F.col("score") >= cfg.scoring.threshold).select(
            F.col("mention_id").alias("src"), F.col("entity_id").alias("dst")
        )

    edges = cat.get_or_compute("edges", compute_edges, resume)

    clusters = cat.get_or_compute(
        "clusters", lambda: connected_components(edges), resume
    )

    # Every mention gets a cluster; unlinked mentions become singletons
    # (otherwise recall would be inflated by silently dropping them).
    assignment = (
        mentions.select("mention_id")
        .join(clusters.withColumnRenamed("node", "mention_id"), "mention_id", "left")
        .select(
            "mention_id",
            F.coalesce("cluster_id", F.col("mention_id")).alias("cluster_id"),
        )
    )

    truth = mentions.select("mention_id", "entity_id")
    metrics: dict = {
        "extract_mismatches": mismatches,
        "contingency": pairwise_f1_from_contingency(assignment, truth),
    }
    if labeled_pairs is not None:
        metrics["labeled"] = pairwise_f1_from_labeled(assignment, labeled_pairs)
    metrics["blocking_recall"] = blocking_recall(
        cands, mentions.select("mention_id", "entity_id")
    )
    metrics["retrieval"] = retrieval_rates(
        scored.join(truth.withColumnRenamed("entity_id", "true_entity_id"), "mention_id")
    ).collect()[0].asDict()

    return {
        "mentions_prepared": m_prep,
        "entities_prepared": e_prep,
        "candidates": cands,
        "scored": scored,
        "edges": edges,
        "clusters": clusters,
        "assignment": assignment,
        "metrics": metrics,
        "catalog": cat,
    }
