"""ANN: brute-force exactness vs numpy; LSH recall on clustered vectors."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators.ann import brute_force_topk, lsh_topk

DIM = 16


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(3)
    centers = rng.standard_normal((5, DIM)) * 3
    rows = []
    for i in range(100):
        c = i % 5
        v = centers[c] + rng.standard_normal(DIM) * 0.1
        v = v / np.linalg.norm(v)
        rows.append((f"v{i:03d}", c, [float(x) for x in v]))
    return spark.createDataFrame(rows, "id string, label int, embedding array<float>")


def numpy_topk(rows, k):
    ids = [r[0] for r in rows]
    mat = np.array([r[2] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    out = {}
    for i, qid in enumerate(ids):
        order = sorted(
            (j for j in range(len(ids)) if j != i),
            key=lambda j: (-sims[i, j], ids[j]),
        )[:k]
        out[qid] = [ids[j] for j in order]
    return out


def test_brute_force_matches_numpy(spark, vec_df):
    rows = [(r["id"], r["label"], r["embedding"]) for r in vec_df.collect()]
    want = numpy_topk(rows, 3)
    got_df = brute_force_topk(
        vec_df.select(F.col("id").alias("query_id"), "embedding"),
        vec_df.select(F.col("id").alias("corpus_id"), "embedding"),
        k=3,
    )
    got = {}
    for r in got_df.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["corpus_id"]))
    got = {q: [c for _, c in sorted(v)] for q, v in got.items()}
    assert got == want


def test_bucket_udf_packed_matches_array(spark, vec_df):
    """make_bucket_udf must give identical buckets for the packed-binary
    and array<float> representations of the same vectors."""
    from entity_linking_spark.functions.vector import pack_f32_udf
    from entity_linking_spark.operators.ann import make_bucket_udf

    udf = make_bucket_udf(DIM, num_planes=4, num_tables=3, seed=7)
    out = vec_df.select(
        "id",
        udf(F.col("embedding")).alias("b_arr"),
        udf(pack_f32_udf(F.col("embedding"))).alias("b_bin"),
    ).collect()
    assert len(out) == 100
    for r in out:
        assert r["b_arr"] == r["b_bin"]


def test_embedding_dedup_no_topk_cap(spark):
    """A 60-member exact-duplicate group must emit ALL C(60,2)=1770 pairs —
    the old k=50 rank cut dropped pairs silently (VERDICT r01 #3)."""
    from entity_linking_spark.operators.ann import embedding_dedup_pairs

    rng = np.random.RandomState(11)
    base = rng.standard_normal(DIM)
    base = base / np.linalg.norm(base)
    rows = [(i, [float(x) for x in base]) for i in range(60)]
    # plus 40 well-separated singletons
    for i in range(60, 100):
        v = rng.standard_normal(DIM) * 5
        v = v / np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "id long, embedding array<float>")
    pairs = embedding_dedup_pairs(df, "id", threshold=0.999, dim=DIM).collect()
    dup_pairs = {(r["id_a"], r["id_b"]) for r in pairs if r["id_a"] < 60 and r["id_b"] < 60}
    assert len(dup_pairs) == 60 * 59 // 2


def test_lsh_topk_recall(spark, vec_df):
    """LSH top-1 must agree with exact top-1 for most queries on strongly
    clustered vectors (same-cluster neighbors share buckets)."""
    q = vec_df.select(F.col("id").alias("query_id"), "embedding")
    c = vec_df.select(F.col("id").alias("corpus_id"), "embedding")
    exact = {
        r["query_id"]: r["corpus_id"]
        for r in brute_force_topk(q, c, k=1).collect()
    }
    approx = {
        r["query_id"]: r["corpus_id"]
        for r in lsh_topk(q, c, dim=DIM, k=1, num_planes=4, num_tables=8).collect()
    }
    hits = sum(1 for k in exact if approx.get(k) == exact[k])
    assert hits / len(exact) >= 0.9


def test_ivf_topk_recall(spark, vec_df):
    """IVF top-1 must agree with exact top-1 for most queries on strongly
    clustered vectors (same-cluster neighbors share centroid lists)."""
    from entity_linking_spark.operators.ann import ivf_topk

    q = vec_df.select(F.col("id").alias("query_id"), "embedding")
    c = vec_df.select(F.col("id").alias("corpus_id"), "embedding")
    exact = {
        r["query_id"]: r["corpus_id"]
        for r in brute_force_topk(q, c, k=1).collect()
    }
    approx = {
        r["query_id"]: r["corpus_id"]
        for r in ivf_topk(q, c, dim=DIM, k=1, num_centroids=8, nprobe=2).collect()
    }
    hits = sum(1 for k in exact if approx.get(k) == exact[k])
    assert hits / len(exact) >= 0.9


def test_ivf_quantizer_deterministic_under_partitioning(spark):
    """The coarse-quantizer sample is order-deterministic (VERDICT r02
    finding #3): orderBy(xxhash64(id)) + limit compiles to a distributed
    partial top-k, so the SAME sample (hence identical centroids) comes
    back under any partitioning / input order — the sandbox proxy for
    two cluster sizes, where the old bare ``limit`` took whichever
    partitions answered first."""
    from entity_linking_spark.operators.ann import _fit_quantizer

    rows = [
        (i, [float((i * 7 + j * 3) % 13) + 0.5 for j in range(8)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    c1 = _fit_quantizer(df.repartition(1), "vec_id", 8, 50, 5)
    c2 = _fit_quantizer(df.repartition(13), "vec_id", 8, 50, 5)
    c3 = _fit_quantizer(df.orderBy(F.desc("vec_id")).repartition(5), "vec_id", 8, 50, 5)
    assert np.array_equal(c1, c2)
    assert np.array_equal(c1, c3)


def test_pack_side_drops_null_embeddings(spark):
    """Rows with NULL embeddings are filtered at pack time — they cannot
    be bucketed or scored (ADVICE r02: they used to crash the packed
    batch decode with an opaque TypeError)."""
    from entity_linking_spark.operators._cache import cache_scope
    from entity_linking_spark.operators.ann import lsh_topk

    rows = [(i, [float(i + j) for j in range(4)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with_null = df.unionByName(
        spark.createDataFrame([(99, None)], "vec_id long, embedding array<float>")
    )
    q = with_null.select((F.col("vec_id") + 100).alias("query_id"), "embedding")
    c = with_null.select(F.col("vec_id").alias("corpus_id"), "embedding")
    with cache_scope():
        got = lsh_topk(q, c, dim=4, k=1).collect()
    ids = {r["query_id"] for r in got} | {r["corpus_id"] for r in got}
    assert 199 not in ids and 99 not in ids
    assert len(got) > 0


def test_packed_to_matrix_rejects_null_with_clear_error():
    import pandas as pd

    from entity_linking_spark.functions.vector import _packed_to_matrix

    s = pd.Series([np.asarray([1.0, 2.0], dtype="<f4").tobytes(), None])
    with pytest.raises(ValueError, match="NULL"):
        _packed_to_matrix(s)


def test_lsh_degenerate_hot_bucket_guard(spark):
    """A degenerate corpus — many identical embeddings collapsing into one
    bucket per table — must NOT produce a quadratic bucket join (VERDICT
    r04 #3): with max_bucket below the clone-group size the hot buckets
    are dropped (via the inverted over-cap anti-join) and the clones pair
    with nobody, while well-separated vectors are unaffected.  With the
    guard disabled the same corpus pairs every clone with every other."""
    from entity_linking_spark.operators.ann import embedding_dedup_pairs

    rng = np.random.RandomState(5)
    base = rng.standard_normal(DIM)
    base = base / np.linalg.norm(base)
    rows = [(i, [float(x) for x in base]) for i in range(80)]  # hot clone group
    df = spark.createDataFrame(rows, "id long, embedding array<float>")

    guarded = embedding_dedup_pairs(
        df, "id", threshold=0.999, dim=DIM, max_bucket=50
    ).count()
    assert guarded == 0  # every bucket holds all 80 clones → over cap → dropped

    unguarded = embedding_dedup_pairs(
        df, "id", threshold=0.999, dim=DIM, max_bucket=None
    ).count()
    assert unguarded == 80 * 79 // 2


def test_lsh_multi_probe_recall_at_least_single_probe(spark, vec_df):
    """Multi-probe must be a candidate SUPERSET of single-probe (same
    tables, plus all Hamming-1 buckets per table), so top-1 recall can
    only improve."""
    q = vec_df.select(F.col("id").alias("query_id"), "embedding")
    c = vec_df.select(F.col("id").alias("corpus_id"), "embedding")
    exact = {
        r["query_id"]: r["corpus_id"]
        for r in brute_force_topk(q, c, k=1).collect()
    }

    def recall(multi_probe):
        approx = {
            r["query_id"]: r["corpus_id"]
            for r in lsh_topk(
                q, c, dim=DIM, k=1, num_planes=6, num_tables=2,
                multi_probe=multi_probe,
            ).collect()
        }
        return sum(1 for k in exact if approx.get(k) == exact[k]) / len(exact)

    assert recall(True) >= recall(False)


def test_choose_lsh_params_hits_target_on_clustered_corpus(spark, vec_df):
    """choose_lsh_params (VERDICT r04 #2) must pick knobs whose MEASURED
    recall@k on the clustered corpus is at or near its prediction for the
    requested target."""
    from entity_linking_spark.operators.ann import choose_lsh_params

    c = vec_df.select(F.col("id").alias("corpus_id"), "embedding")
    params = choose_lsh_params(c, k=3, target_recall=0.9, sample=100)
    assert params["met_target"] and params["predicted_recall"] >= 0.9

    q = vec_df.select(F.col("id").alias("query_id"), "embedding")
    exact = brute_force_topk(q, c, k=3).select("query_id", "corpus_id")
    approx = lsh_topk(
        q, c, dim=DIM, k=3,
        num_planes=params["num_planes"], num_tables=params["num_tables"],
        multi_probe=params["multi_probe"],
    ).select("query_id", "corpus_id")
    got = approx.intersect(exact).count() / exact.count()
    # measured recall may sit under the analytic prediction (finite
    # sample, per-query variance) but must clear the target with slack
    assert got >= 0.85, got


def test_choose_lsh_params_honest_fallback_when_target_unreachable(spark):
    """On a pathologically uniform corpus no config reaches an extreme
    target — the helper must say so (met_target=False) instead of
    silently returning a weak config as if it had."""
    from entity_linking_spark.operators.ann import choose_lsh_params

    rng = np.random.RandomState(9)
    rows = []
    for i in range(64):
        v = rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in (v / np.linalg.norm(v))]))
    df = spark.createDataFrame(rows, "corpus_id long, embedding array<float>")
    params = choose_lsh_params(
        df, k=5, target_recall=0.999, sample=64,
        planes_grid=(10, 12), max_tables=2, allow_multi_probe=False,
    )
    assert params["met_target"] is False
    assert 0.0 <= params["predicted_recall"] < 0.999


def test_choose_lsh_params_respects_bucket_guard(spark, vec_df):
    """The chooser's recall prediction assumes every colliding bucket is
    probed, but lsh_topk's max_bucket guard DROPS over-cap buckets — so
    plane counts whose mean bucket load (|corpus| / 2^planes) brushes
    the cap must be screened out of the grid, and when the screen
    excludes every plane count the helper must fall back honestly
    (met_target=False) rather than predict recall the guard will shed."""
    from entity_linking_spark.operators.ann import choose_lsh_params

    c = vec_df.select(F.col("id").alias("corpus_id"), "embedding")
    n = c.count()

    # cap so tight every plane count in the grid fails the mean-load
    # screen (n / 2^planes > cap/4 for all planes): honest fallback
    tiny_cap = max(1, int(n / 2 ** 4))
    params = choose_lsh_params(
        c, k=3, target_recall=0.5, sample=100,
        planes_grid=(2, 3, 4), max_bucket=tiny_cap,
    )
    assert params["met_target"] is False
    assert params["num_planes"] == 4  # finest granularity available

    # max_bucket=None disables the screen entirely: same grid now meets
    # the same target (clustered corpus, low bar)
    params_off = choose_lsh_params(
        c, k=3, target_recall=0.5, sample=100,
        planes_grid=(2, 3, 4), max_bucket=None,
    )
    assert params_off["met_target"] is True


def test_choose_ivf_params_hits_target_on_clustered_corpus(spark, vec_df):
    """choose_ivf_params (the IVF twin of the LSH recall policy) must
    pick (num_centroids, nprobe) whose MEASURED recall@k on the
    clustered corpus is at or near its empirical prediction."""
    from entity_linking_spark.operators.ann import choose_ivf_params, ivf_topk

    c = vec_df.select(F.col("id").alias("corpus_id"), "embedding")
    params = choose_ivf_params(c, k=3, target_recall=0.9, sample=100)
    assert params["met_target"] and params["predicted_recall"] >= 0.9

    q = vec_df.select(F.col("id").alias("query_id"), "embedding")
    exact = brute_force_topk(q, c, k=3).select("query_id", "corpus_id")
    approx = ivf_topk(
        q, c, dim=DIM, k=3,
        num_centroids=params["num_centroids"], nprobe=params["nprobe"],
    ).select("query_id", "corpus_id")
    got = approx.intersect(exact).count() / exact.count()
    assert got >= 0.85, got


def test_choose_ivf_params_honest_fallback_under_probe_budget(spark):
    """Probing every list is brute force, so without a work bound the
    target is always met at nprobe=num_centroids; under a max_nprobe
    budget on a uniform corpus the helper must report met_target=False
    with its best-effort config instead of overclaiming."""
    from entity_linking_spark.operators.ann import choose_ivf_params

    rng = np.random.RandomState(11)
    rows = []
    for i in range(64):
        v = rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in (v / np.linalg.norm(v))]))
    df = spark.createDataFrame(rows, "corpus_id long, embedding array<float>")
    # uniform corpus: true neighbors scatter across lists, so 1 probe of
    # 16 lists cannot reach 0.99 recall
    params = choose_ivf_params(
        df, k=5, target_recall=0.99, sample=64,
        centroid_grid=(16,), max_nprobe=1,
    )
    assert params["met_target"] is False
    assert params["nprobe"] == 1
    assert params["predicted_recall"] < 0.99

    # unbounded: nprobe may rise to num_centroids, where recall is 1.0
    # by construction — the target is met
    full = choose_ivf_params(
        df, k=5, target_recall=0.99, sample=64, centroid_grid=(16,)
    )
    assert full["met_target"] is True


def test_choose_lsh_params_screens_query_side_multiprobe_load(spark):
    """The bucket guard drops buckets where EITHER side over-fills, and
    multi-probe multiplies the QUERY-side keys by (1 + planes) — so the
    chooser's load screen must model both sides, not just the corpus
    (a corpus-scale query set would otherwise get met_target=True for a
    config the guard then guts).  n_queries declares the real query
    count for asymmetric workloads."""
    from entity_linking_spark.operators.ann import choose_lsh_params

    rng = np.random.RandomState(11)
    rows = []
    for i in range(64):
        v = rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in (v / np.linalg.norm(v))]))
    df = spark.createDataFrame(rows, "corpus_id long, embedding array<float>")

    # planes=6, ≤8 tables: only multi-probe reaches 0.6 on this uniform
    # corpus.  max_bucket=8 → cap/4 = 2: corpus load 64/64 = 1 passes,
    # but the self-retrieval query side under multi-probe is
    # 64·(1+6)/64 = 7 > 2 — mp must be screened → target unreachable.
    capped = choose_lsh_params(
        df, k=5, target_recall=0.6, sample=64,
        planes_grid=(6,), max_tables=8, max_bucket=8,
    )
    assert capped["met_target"] is False
    assert capped["multi_probe"] is False

    # same cap, but the caller declares a tiny query set: query-side
    # load 1·7/64 ≪ 2 — multi-probe is back on the grid and meets
    small_q = choose_lsh_params(
        df, k=5, target_recall=0.6, sample=64,
        planes_grid=(6,), max_tables=8, max_bucket=8, n_queries=1,
    )
    assert small_q["met_target"] is True
    assert small_q["multi_probe"] is True

    # no guard → no screen: multi-probe meets the target outright
    uncapped = choose_lsh_params(
        df, k=5, target_recall=0.6, sample=64,
        planes_grid=(6,), max_tables=8, max_bucket=None,
    )
    assert uncapped["met_target"] is True
    assert uncapped["multi_probe"] is True


def test_choose_lsh_params_load_screen_ignores_null_embeddings(spark, vec_df):
    """The screen's corpus size must count EMBEDDED rows only — lsh_topk
    drops NULL embeddings before bucketing, so a mostly-NULL corpus
    (common after a failed encode backfill) must not screen out every
    config that the real bucketed population passes."""
    from entity_linking_spark.operators.ann import choose_lsh_params

    c = vec_df.select(F.col("id").alias("corpus_id"), "embedding")
    nulls = spark.range(10_000).select(
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("corpus_id"),
        F.lit(None).cast("array<float>").alias("embedding"),
    )
    # 100 embedded rows: load 100·1/16 ≈ 6 ≤ cap/4 = 25 — passes; the
    # 10_100-row raw count would read 631 > 25 and screen everything
    params = choose_lsh_params(
        c.unionByName(nulls), k=3, target_recall=0.5, sample=100,
        planes_grid=(4,), allow_multi_probe=False, max_bucket=100,
    )
    assert params["met_target"] is True
