"""Round-trip the reference's .npy embedding-store format
(np.save of {'embeddings', 'ids'} dicts — reference
src/compute_embeddings.py:73-75, src/eval_zeshel.py:28-31)."""

import numpy as np
from pyspark.sql import functions as F

from entity_linking_spark.sources.npy import load_npy_store, save_npy_store

SF_DIR = "/root/testdata/sf0.001"


def test_reference_store_round_trip(spark, tmp_path):
    """parquet → save_npy_store → np.load (reference idiom) →
    load_npy_store → identical (id, embedding) rows."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").where(F.col("vec_id") < 40)
    path = save_npy_store(emb, str(tmp_path / "entity_store"))

    # the reference's own load idiom must work on our artifact
    store = np.load(path, allow_pickle=True).item()
    assert store["embeddings"].dtype == np.float32
    assert len(store["ids"]) == store["embeddings"].shape[0] == 40

    back = load_npy_store(spark, path)
    want = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float32)
        for r in emb.collect()
    }
    got = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float32)
        for r in back.collect()
    }
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])


def test_mention_store_extra_keys(spark, tmp_path):
    """Mention stores carry entity_ids/mention_ids
    (compute_embeddings.py:107-110); extra_keys maps them both ways."""
    rows = [(f"m{i}", f"e{i % 3}", [float(i), 0.5]) for i in range(6)]
    df = spark.createDataFrame(
        rows, "mention_id string, true_entity_id string, embedding array<float>"
    )
    path = save_npy_store(
        df,
        str(tmp_path / "mention_store"),
        id_col="mention_id",
        id_key="mention_ids",
        extra_keys={"true_entity_id": "entity_ids"},
    )
    store = np.load(path, allow_pickle=True).item()
    assert set(store) == {"embeddings", "mention_ids", "entity_ids"}

    back = load_npy_store(
        spark,
        path,
        id_key="mention_ids",
        id_col="mention_id",
        extra_keys={"entity_ids": "true_entity_id"},
    )
    got = {(r["mention_id"], r["true_entity_id"]) for r in back.collect()}
    assert got == {(f"m{i}", f"e{i % 3}") for i in range(6)}


def test_loaded_store_feeds_retrieval(spark, tmp_path):
    """A store written in reference format must plug straight into the
    ANN/retrieval path with identical results to the parquet path."""
    from entity_linking_spark.operators.ann import brute_force_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").where(F.col("vec_id") < 30)
    path = save_npy_store(emb, str(tmp_path / "store"))
    back = load_npy_store(spark, path)

    q = emb.select(F.col("vec_id").alias("query_id"), "embedding").where(F.col("query_id") < 5)
    top_parquet = brute_force_topk(
        q, emb.select(F.col("vec_id").alias("corpus_id"), "embedding"), k=3
    )
    top_npy = brute_force_topk(
        q, back.select(F.col("vec_id").alias("corpus_id"), "embedding"), k=3
    )
    key = lambda r: (r["query_id"], r["rank"])
    want = {key(r): r["corpus_id"] for r in top_parquet.collect()}
    got = {key(r): r["corpus_id"] for r in top_npy.collect()}
    assert got == want
