"""Pairwise scoring: embedding dot product + surface similarity.

Score semantics from the reference: similarity = dot product of the two
128-d embeddings in a shared space (reference src/bi_encoder.py:96,
src/eval_zeshel.py:44).  The north rule adds Jaro-Winkler + Levenshtein
surface similarity.  Everything crosses Python exactly once per batch:
cosine + JW run in Arrow pandas UDFs (np.einsum / vectorized numpy),
Levenshtein stays JVM-side (built-in, codegen).

Blend: score = w_cos·cosine + w_jw·jaro_winkler + w_lev·lev_sim.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_linking_spark.functions.similarity import (
    jaro_winkler_udf,
    levenshtein_similarity,
)
from entity_linking_spark.functions.vector import cosine_batch_udf


@dataclass(frozen=True)
class ScoringConfig:
    w_cosine: float = 0.5
    w_jaro_winkler: float = 0.3
    w_levenshtein: float = 0.2
    threshold: float = 0.75


def sorted_tokens(col) -> "F.Column":
    """Token-order-canonical form: 'falcon crimson' → 'crimson falcon'.
    Taking max(sim(raw), sim(sorted)) makes surface similarity robust to
    token swaps/reorderings in aliases — a standard record-linkage trick
    the reference never needs (its scores are embedding-only)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(" ", F.array_sort(F.split(c, " ")))


def score_pairs(
    pairs: DataFrame,
    emb_a: str = "emb_a",
    emb_b: str = "emb_b",
    surf_a: str = "surf_a",
    surf_b: str = "surf_b",
    conf: ScoringConfig = ScoringConfig(),
    token_order_invariant: bool = True,
) -> DataFrame:
    jw = jaro_winkler_udf(F.col(surf_a), F.col(surf_b))
    lev = levenshtein_similarity(surf_a, surf_b)
    if token_order_invariant:
        sa, sb = sorted_tokens(surf_a), sorted_tokens(surf_b)
        jw = F.greatest(jw, jaro_winkler_udf(sa, sb))
        lev = F.greatest(lev, levenshtein_similarity(sa, sb))
    scored = pairs.withColumns(
        {
            "cosine": cosine_batch_udf(F.col(emb_a), F.col(emb_b)),
            "jaro_winkler": jw,
            "lev_sim": lev,
        }
    )
    return scored.withColumn(
        "score",
        F.lit(conf.w_cosine) * F.col("cosine")
        + F.lit(conf.w_jaro_winkler) * F.col("jaro_winkler")
        + F.lit(conf.w_levenshtein) * F.col("lev_sim"),
    )


def match_edges(scored: DataFrame, src: str, dst: str,
                conf: ScoringConfig = ScoringConfig()) -> DataFrame:
    """Thresholded match edges for the clustering stage."""
    return scored.where(F.col("score") >= conf.threshold).select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    )
