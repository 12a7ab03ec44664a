"""Per-group top-k and the retrieval-rate evaluation harness.

Reference semantics: per-mention argsort-desc top-k over scores
(src/eval_zeshel.py:48-50) with ties broken by array index; here the
tie-break is an explicit total order (score desc, id asc) so results are
deterministic under any partitioning (SURVEY.md §2.5 W1).

The reference recomputes the full score matrix for every k in
{1,4,8,16,32,64} (src/eval_zeshel.py:33,44 — 6× redundant work); here the
rank of the true entity is computed once and every k derives from one
aggregation pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_KS = (1, 4, 8, 16, 32, 64)  # reference src/eval_zeshel.py:33


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_cols: list[str] | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def rank_of_true(
    scored: DataFrame,
    group_col: str = "mention_id",
    candidate_col: str = "entity_id",
    truth_col: str = "true_entity_id",
    score_col: str = "score",
) -> DataFrame:
    """Per mention: the rank its true entity achieved (null if the true
    entity never entered the candidate set — a blocking miss)."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(candidate_col).asc()
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    return ranked.groupBy(group_col, truth_col).agg(
        F.min(F.when(F.col(candidate_col) == F.col(truth_col), F.col("rank"))).alias(
            "true_rank"
        )
    )


def retrieval_rates(
    scored: DataFrame,
    ks: tuple[int, ...] = DEFAULT_KS,
    group_col: str = "mention_id",
    candidate_col: str = "entity_id",
    truth_col: str = "true_entity_id",
    score_col: str = "score",
) -> DataFrame:
    """One-row DataFrame: retrieval_rate_k{k} columns, mirroring the
    reference metric (src/eval_zeshel.py:38-53) in a single pass."""
    ranks = rank_of_true(scored, group_col, candidate_col, truth_col, score_col)
    aggs = [
        F.avg(
            F.when(F.col("true_rank").isNotNull() & (F.col("true_rank") <= k), 1.0)
            .otherwise(0.0)
        ).alias(f"retrieval_rate_k{k}")
        for k in ks
    ]
    return ranks.agg(*aggs)
