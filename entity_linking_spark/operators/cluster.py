"""Transitive clustering: large-star / small-star connected components.

The reference has no graph stage (mention→entity assignment is a per-row
argmax, src/eval_zeshel.py:48-50); transitive clustering over the
match-edge DataFrame is a north-rule addition.  Algorithm: alternating
large-star / small-star rounds (Kiveris et al., "Connected Components in
MapReduce and Beyond") — converges in O(log n) rounds on pathological
chains, each round two shuffles (groupBy node + join back).

Engineering notes (SURVEY.md §4.3):
- Catalyst cannot express fixpoints → a driver loop with per-iteration
  ``localCheckpoint()`` to cut lineage (otherwise the plan doubles each
  round and the optimizer chokes by iteration ~10).
- Convergence test: deterministic edge-set checksum (count + sum of
  xxhash64) — two scalar aggregations, no expensive except/subtract.
- Node ids stay strings: min() is lexicographic, collision-free at any
  scale (hashing to 64-bit ints would birthday-collide near 10^10 nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u})."""
    nbrs = _symmetrize(edges)
    mins = nbrs.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        nbrs.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Point every edge from its larger endpoint; connect each smaller
    neighbor (and the node itself) to the minimum neighbor."""
    canon = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    mins = canon.groupBy("src").agg(F.min("dst").alias("m"))
    to_min = (
        canon.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    self_edge = mins.select("src", F.col("m").alias("dst"))
    return to_min.union(self_edge).where(F.col("src") != F.col("dst")).distinct()


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # bit_xor: order-insensitive and overflow-free (edges are distinct,
    # so xor cancellation of duplicate rows cannot occur); ANSI-safe.
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    checkpoint_hook=None,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``edges``; cluster_id
    is the lexicographic minimum node id of the component (FIXTURES.md §5
    convention).  ``checkpoint_hook(iteration, edges_df)`` is called once
    per round for resumable-pipeline integration."""
    all_nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )

    cur = (
        edges.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    prev_sum = _checksum(cur)
    for it in range(max_iterations):
        cur = _small_star(_large_star(cur)).localCheckpoint()
        if checkpoint_hook is not None:
            checkpoint_hook(it, cur)
        cur_sum = _checksum(cur)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    # At fixpoint every edge is (node, component-min).
    assign = cur.select(F.col("src").alias("node"), F.col("dst").alias("cluster_id"))
    roots_and_isolated = all_nodes.join(
        assign.select("node"), "node", "left_anti"
    ).select("node", F.col("node").alias("cluster_id"))
    return assign.union(roots_and_isolated)
