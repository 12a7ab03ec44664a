"""Deterministic encoder: unit norm, determinism, similarity ordering."""

import numpy as np
import pandas as pd
import pytest

from entity_linking_spark.functions.encoder import embed_series, embed_text


def test_unit_norm_and_dim():
    out = embed_series(pd.Series(["hello world", "x", ""]))
    for v in out:
        assert len(v) == 128
    assert np.linalg.norm(out[0]) == pytest.approx(1.0, abs=1e-5)
    assert np.linalg.norm(np.array(out[2])) == 0.0  # empty text → zero vector


def test_deterministic():
    a = embed_series(pd.Series(["crimson falcon society"]))[0]
    b = embed_series(pd.Series(["crimson falcon society"]))[0]
    np.testing.assert_array_equal(a, b)


def test_similarity_ordering():
    texts = pd.Series(
        ["crimson falcon society", "crimson falcon sociwty", "umbral quarry union"]
    )
    vs = [np.array(v, dtype=np.float64) for v in embed_series(texts)]
    sim_typo = vs[0] @ vs[1]
    sim_diff = vs[0] @ vs[2]
    assert sim_typo > 0.7
    assert sim_typo > sim_diff + 0.3


def test_spark_udf_matches_local(spark):
    df = spark.createDataFrame([("some text here",)], "t string")
    got = np.array(df.select(embed_text("t").alias("e")).collect()[0]["e"])
    want = np.array(embed_series(pd.Series(["some text here"]))[0])
    np.testing.assert_allclose(got, want, atol=1e-7)
