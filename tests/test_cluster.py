"""Large-star/small-star connected components vs a union-find oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators.cluster import connected_components


def union_find_oracle(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # compress to component-min
    comp: dict[str, list[str]] = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for root, members in comp.items() for n in members}


def run_cc(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    return got


def test_cc_simple_components(spark):
    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p")]
    got = run_cc(spark, edges)
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "p": "p"}


def test_cc_long_chain(spark):
    """Pathological chain — exercises the O(log n) star rounds."""
    n = 64
    edges = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n)]
    got = run_cc(spark, edges)
    assert set(got.values()) == {"n000"}
    assert len(got) == n + 1


def test_cc_random_graphs_match_union_find(spark):
    rng = np.random.RandomState(7)
    nodes = [f"v{i:04d}" for i in range(200)]
    edges = [
        (nodes[rng.randint(0, 200)], nodes[rng.randint(0, 200)]) for _ in range(150)
    ]
    got = run_cc(spark, edges)
    want = union_find_oracle(edges)
    assert got == want


def test_cc_deterministic_across_partitionings(spark):
    edges = [(f"a{i}", f"a{(i * 7) % 40}") for i in range(40)]
    df1 = spark.createDataFrame(edges, "src string, dst string").repartition(2)
    df2 = spark.createDataFrame(edges, "src string, dst string").repartition(16)
    r1 = {r["node"]: r["cluster_id"] for r in connected_components(df1).collect()}
    r2 = {r["node"]: r["cluster_id"] for r in connected_components(df2).collect()}
    assert r1 == r2
