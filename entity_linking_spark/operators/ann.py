"""Approximate nearest neighbor over an embedding column.

- ``brute_force_topk``: exact cosine top-k — the correctness baseline and
  the reference's own retrieval semantics (full M×N scoring,
  src/eval_zeshel.py:44-49).  Cross join: only for small corpora / audits.
- ``lsh_topk``: random-hyperplane (sign) LSH — the scale path.  Vectors
  land in 2^num_planes buckets per table; queries probe their bucket in
  every table; candidates scored exactly, then per-query top-k.  Bucket
  signatures are computed in one Arrow pandas UDF with a seeded
  deterministic hyperplane matrix (same on every executor — derived from
  the seed, no broadcast state needed).

Scale: the bucket join shuffles on (table, bucket) keys; hyperplane count
trades recall vs bucket size (tune planes ≈ log2(N / wanted_bucket_size)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from entity_linking_spark.functions.vector import cosine
from entity_linking_spark.operators.topk import top_k_per_group


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: queries(id, embedding) × corpus(id, embedding)."""
    q = queries.select(F.col(query_id).alias("query_id"), F.col("embedding").alias("q_emb"))
    c = corpus.select(F.col(corpus_id).alias("corpus_id"), F.col("embedding").alias("c_emb"))
    pairs = q.crossJoin(c)
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("corpus_id"))
    scored = pairs.withColumn("cosine", cosine("q_emb", "c_emb"))
    return top_k_per_group(
        scored.select("query_id", "corpus_id", "cosine"),
        ["query_id"],
        "cosine",
        k,
        tiebreak_cols=["corpus_id"],
    )


def make_bucket_udf(dim: int, num_planes: int, num_tables: int, seed: int = 42):
    """array<long> of per-table sign-LSH bucket ids for an embedding col."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim)).astype(np.float64)
    powers = (1 << np.arange(num_planes)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def bucket_udf(emb: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(x, dtype=np.float64) for x in emb])
        if mat.size == 0:
            return pd.Series([], dtype=object)
        out = []
        signs = np.einsum("tpd,nd->ntp", planes, mat) > 0
        buckets = signs @ powers  # (n, tables)
        for row in buckets:
            out.append(row.tolist())
        return pd.Series(out)

    return bucket_udf


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Sign-LSH bucketed cosine top-k (approximate; recall grows with
    num_tables, bucket size shrinks with num_planes)."""
    bucket_udf = make_bucket_udf(dim, num_planes, num_tables, seed)

    def with_keys(df: DataFrame, id_col: str, out_id: str, emb_out: str) -> DataFrame:
        b = df.select(
            F.col(id_col).alias(out_id),
            F.col("embedding").alias(emb_out),
            F.posexplode(bucket_udf(F.col("embedding"))).alias("table", "bucket"),
        )
        return b.withColumn(
            "bkey", F.concat_ws(":", F.col("table").cast("string"), F.col("bucket").cast("string"))
        ).drop("table", "bucket")

    qk = with_keys(queries, query_id, "query_id", "q_emb")
    ck = with_keys(corpus, corpus_id, "corpus_id", "c_emb")
    cand = qk.join(ck, "bkey").select("query_id", "q_emb", "corpus_id", "c_emb")
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("corpus_id"))
    cand = cand.dropDuplicates(["query_id", "corpus_id"])
    scored = cand.withColumn("cosine", cosine("q_emb", "c_emb"))
    return top_k_per_group(
        scored.select("query_id", "corpus_id", "cosine"),
        ["query_id"],
        "cosine",
        k,
        tiebreak_cols=["corpus_id"],
    )


def embedding_dedup_pairs(
    df: DataFrame,
    id_col: str,
    threshold: float = 0.95,
    dim: int = 64,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets (id_a < id_b)."""
    ids = df.select(F.col(id_col).alias("query_id"), "embedding")
    hits = lsh_topk(
        ids,
        ids.withColumnRenamed("query_id", "corpus_id"),
        dim=dim,
        k=50,
        num_planes=num_planes,
        num_tables=num_tables,
        seed=seed,
    )
    return (
        hits.where(F.col("cosine") >= threshold)
        .where(F.col("query_id") < F.col("corpus_id"))
        .select(
            F.col("query_id").alias("id_a"),
            F.col("corpus_id").alias("id_b"),
            "cosine",
        )
    )
