"""Interop with the reference's numpy embedding stores.

The reference persists embeddings as ``np.save(path, {'embeddings':
(n,d) float32, 'ids': [...]})`` — a 0-d object ndarray holding a pickled
dict, re-read with ``np.load(path, allow_pickle=True).item()`` (reference
src/compute_embeddings.py:73-75 for entity stores, :105-110 for mention
stores which carry {'embeddings', 'entity_ids', 'mention_ids'};
src/eval_zeshel.py:28-31 consumes both).

This shim converts those stores to/from the engine's embeddings
DataFrame shape (id, embedding array<float>[, label]), so the engine can
evaluate retrieval rates on artifacts the reference actually produced.
Stores are reference-sized (the reference holds them fully in driver
RAM — np.matmul over the whole matrix, eval_zeshel.py:44), so a
driver-side numpy→createDataFrame hop is the honest physical plan; the
engine's own scale path stays parquet (TESTDATA embeddings tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def load_npy_store(
    spark: SparkSession,
    path: str,
    id_key: str = "ids",
    id_col: str = "vec_id",
    extra_keys: dict[str, str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Reference .npy store → DataFrame(id_col, embedding array<float>, *extra).

    ``extra_keys`` maps store keys to output columns, e.g. a mention
    store loads with ``id_key='mention_ids',
    extra_keys={'entity_ids': 'true_entity_id'}``."""
    store = np.load(path, allow_pickle=True).item()
    emb = np.asarray(store["embeddings"], dtype=np.float32)
    n = emb.shape[0]
    cols = {id_col: list(store[id_key]), "embedding": [row.tolist() for row in emb]}
    for key, out in (extra_keys or {}).items():
        vals = list(store[key])
        if len(vals) != n:
            raise ValueError(f"store key {key!r} has {len(vals)} values for {n} embeddings")
        cols[out] = vals
    df = spark.createDataFrame(pd.DataFrame(cols))
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def save_npy_store(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    id_key: str = "ids",
    extra_keys: dict[str, str] | None = None,
) -> str:
    """DataFrame → reference-format .npy store (float32 matrix + id list).

    ``extra_keys`` maps DataFrame columns to store keys (inverse of
    load).  Returns the path numpy actually wrote (np.save appends .npy
    when missing)."""
    select = [id_col, emb_col] + list((extra_keys or {}).keys())
    pdf = df.select(*select).toPandas()
    emb = np.array([np.asarray(x, dtype=np.float32) for x in pdf[emb_col]])
    store = {"embeddings": emb, id_key: list(pdf[id_col])}
    for col, key in (extra_keys or {}).items():
        store[key] = list(pdf[col])
    if not path.endswith(".npy"):
        path = path + ".npy"
    np.save(path[: -len(".npy")], store)
    return path
