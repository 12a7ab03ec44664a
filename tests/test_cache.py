"""Tracked-cache lifecycle: operator-internal persists must not outlive
their query (VERDICT r02 finding #4 / ADVICE r02 — every
lsh_topk/dedup/blocking call used to leak MEMORY_AND_DISK frames for the
session lifetime)."""

from pyspark.sql import functions as F

from entity_linking_spark.operators._cache import cache_scope, release_cached, track


def _n_persisted(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _docs(spark):
    rows = [(i, f"tok{i}a tok{i}b tok{i}c tok{i}d") for i in range(20)]
    rows += [(i + 1000, rows[i][1]) for i in range(5)]  # planted dups
    return spark.createDataFrame(rows, "id long, text string")


def _emb(spark):
    rows = [(i, [float((i * 7 + j) % 13) + 1.0 for j in range(8)]) for i in range(30)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_back_to_back_operators_release_all_caches(spark):
    """Two operators run and collect inside one scope; after the scope
    exits, the session's persisted-RDD set is back to its baseline."""
    from entity_linking_spark.operators.ann import lsh_topk
    from entity_linking_spark.operators.dedup import minhash_lsh_pairs

    base = _n_persisted(spark)
    emb = _emb(spark)
    q = emb.select((F.col("vec_id") + 100).alias("query_id"), "embedding")
    c = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    with cache_scope():
        assert len(lsh_topk(q, c, dim=8, k=2).collect()) > 0
        assert minhash_lsh_pairs(_docs(spark), "id", "text", shingle_k=2).count() == 5
        assert _n_persisted(spark) > base  # the caches actually engaged
    assert _n_persisted(spark) == base


def test_nested_scopes_release_only_their_own(spark):
    base = _n_persisted(spark)
    df = spark.range(10)
    with cache_scope():
        outer = track(df.select("id"))
        outer.count()
        with cache_scope():
            inner = track(df.select((F.col("id") * 2).alias("id")))
            inner.count()
            assert _n_persisted(spark) == base + 2
        assert _n_persisted(spark) == base + 1  # inner released, outer kept
    assert _n_persisted(spark) == base


def test_release_cached_sweeps_everything(spark):
    # earlier test files may have tracked (and never released) operator
    # caches — sweep them first so the baseline is this test's own
    release_cached()
    base = _n_persisted(spark)
    t1 = track(spark.range(5))
    t1.count()
    t2 = track(spark.range(7))
    t2.count()
    assert _n_persisted(spark) == base + 2
    assert release_cached() >= 2
    assert _n_persisted(spark) == base


def test_concurrent_scopes_are_thread_isolated(spark):
    """Registry is threading.local (ADVICE r03): concurrent cache_scope()
    blocks on different threads must not unpersist each other's frames —
    with the old module-global list, thread B's scope exit (position mark
    0) swept thread A's still-in-scope cache."""
    import threading

    release_cached()
    base = _n_persisted(spark)
    a_cached = threading.Event()
    b_done = threading.Event()
    errors = []

    def thread_a():
        try:
            with cache_scope():
                t = track(spark.range(50).select((F.col("id") % 5).alias("k")))
                t.count()
                a_cached.set()
                # B's whole scope opens and closes while A is mid-scope
                assert b_done.wait(30)
                # A's frame must still be persisted (not swept by B)
                assert t.storageLevel.useMemory or t.storageLevel.useDisk
                assert _n_persisted(spark) >= base + 1
        except Exception as e:  # surfaced in the main thread below
            errors.append(e)
            a_cached.set()

    def thread_b():
        try:
            assert a_cached.wait(30)
            with cache_scope():
                t = track(spark.range(30).select((F.col("id") * 3).alias("v")))
                t.count()
        except Exception as e:
            errors.append(e)
        finally:
            b_done.set()

    ta, tb = threading.Thread(target=thread_a), threading.Thread(target=thread_b)
    ta.start(); tb.start()
    ta.join(60); tb.join(60)
    assert not errors, errors
    assert _n_persisted(spark) == base


def test_released_plan_still_computes(spark):
    """Unpersisting is never a correctness event — a plan whose cached
    parent was released recomputes."""
    with cache_scope():
        cached = track(spark.range(100).select((F.col("id") % 10).alias("k")))
        out = cached.groupBy("k").count()
    assert out.count() == 10  # evaluated AFTER the scope released `cached`
