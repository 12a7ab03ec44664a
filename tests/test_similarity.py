"""Jaro-Winkler golden values + Levenshtein similarity (SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from entity_linking_spark.functions.similarity import (
    jaro_winkler_batch,
    jaro_winkler_udf,
    levenshtein_similarity,
)

# Hand-checked classics (Winkler's paper / Apache Commons convention:
# unconditional prefix boost, p=0.1, max prefix 4).
GOLDENS = [
    ("MARTHA", "MARHTA", 0.9611),
    ("DIXON", "DICKSONX", 0.8133),
    ("JELLYFISH", "SMELLYFISH", 0.8963),
    ("DWAYNE", "DUANE", 0.8400),
    ("", "", 1.0),
    ("abc", "", 0.0),
    ("", "abc", 0.0),
    ("same", "same", 1.0),
    ("a", "a", 1.0),
    ("a", "b", 0.0),
    ("münchen", "munchen", 0.9143),  # unicode: ü≠u, m=6/7, prefix=1
]


@pytest.mark.parametrize("a,b,expected", GOLDENS)
def test_jaro_winkler_goldens(a, b, expected):
    got = float(jaro_winkler_batch(pd.Series([a]), pd.Series([b]))[0])
    assert got == pytest.approx(expected, abs=1e-4)


def test_jaro_winkler_symmetric_and_batched():
    a = pd.Series(["MARTHA", "DIXON", "x", ""])
    b = pd.Series(["MARHTA", "DICKSONX", "x", "y"])
    fwd = jaro_winkler_batch(a, b)
    rev = jaro_winkler_batch(b, a)
    np.testing.assert_allclose(fwd, rev, atol=1e-12)


def test_jaro_winkler_udf_on_spark(spark):
    df = spark.createDataFrame([("MARTHA", "MARHTA")], "a string, b string")
    got = df.select(jaro_winkler_udf("a", "b").alias("jw")).collect()[0]["jw"]
    assert got == pytest.approx(0.9611, abs=1e-4)


def test_levenshtein_similarity(spark):
    df = spark.createDataFrame(
        [("kitten", "sitting"), ("same", "same"), ("", ""), ("abc", "")],
        "a string, b string",
    )
    got = [r["l"] for r in df.select(levenshtein_similarity("a", "b").alias("l")).collect()]
    assert got[0] == pytest.approx(1 - 3 / 7)
    assert got[1] == 1.0
    assert got[2] == 1.0
    assert got[3] == 0.0
