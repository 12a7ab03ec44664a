"""Transform-stage parity with reference src/transform_zeshel.py semantics."""

from pyspark.sql import functions as F

from entity_linking_spark.operators.transform import (
    combine_entities,
    dedup_last_wins,
    denormalize_mentions,
    entity_overlap_counts,
    tiny_split,
    union_corpora,
)

DOCS = [
    ("c1", "d1", "Doc One", "text one"),
    ("c1", "d2", "Doc Two", "text two"),
    ("c2", "d3", "Doc Three", "text three"),
]
MENTIONS = [
    ("m1", "d1", "d2", "c1", "one", 0, 0, "cat"),
    ("m2", "d2", "d1", "c1", "two", 0, 0, "cat"),
    ("m2", "d2", "d1", "c1", "two-dup", 0, 0, "cat"),  # dup key → last wins
    ("m3", "d3", "d3", "c2", "three", 0, 0, "cat"),
]


def _dfs(spark):
    docs = spark.createDataFrame(
        DOCS, "corpus string, document_id string, title string, text string"
    )
    mentions = spark.createDataFrame(
        MENTIONS,
        "mention_id string, context_document_id string, label_document_id string, "
        "corpus string, text string, start_index long, end_index long, category string",
    )
    return docs, mentions


def test_denormalize_attaches_both_documents(spark):
    docs, mentions = _dfs(spark)
    out = denormalize_mentions(mentions, docs)
    rows = {r["mention_id"]: r for r in out.collect()}
    assert len(rows) == 3  # m2 deduped
    assert rows["m1"]["source_document"]["title"] == "Doc One"
    assert rows["m1"]["label_document"]["title"] == "Doc Two"
    assert rows["m3"]["source_document"]["document_id"] == "d3"


def test_dedup_last_wins_order(spark):
    df = spark.createDataFrame(
        [("k", 1, "first"), ("k", 2, "second"), ("j", 5, "only")],
        "key string, seq long, val string",
    )
    out = {r["key"]: r["val"] for r in dedup_last_wins(df, ["key"], "seq").collect()}
    assert out == {"k": "second", "j": "only"}


def test_combine_entities_distinct(spark):
    docs, mentions = _dfs(spark)
    ents = combine_entities(denormalize_mentions(mentions, docs))
    ids = sorted(r["document_id"] for r in ents.collect())
    assert ids == ["d1", "d2", "d3"]


def test_union_corpora_dedups(spark):
    docs, _ = _dfs(spark)
    a = docs.select("document_id", "title")
    b = spark.createDataFrame(
        [("d3", "Doc Three Again"), ("d4", "Doc Four")], "document_id string, title string"
    )
    out = union_corpora(a, b)
    assert out.count() == 4


def test_tiny_split_deterministic(spark):
    _, mentions = _dfs(spark)
    t = tiny_split(mentions.dropDuplicates(["mention_id"]), n=2)
    assert [r["mention_id"] for r in t.collect()] == ["m1", "m2"]


def test_entity_overlap(spark):
    a = spark.createDataFrame([("d1",), ("d2",)], "document_id string")
    b = spark.createDataFrame([("d2",), ("d3",)], "document_id string")
    assert entity_overlap_counts(a, b) == 1


def test_stratified_sample_exact_and_deterministic(spark):
    from entity_linking_spark.operators.transform import stratified_sample

    rows = [(i, "en" if i % 3 else "fr", f"s{i % 2}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, source string")
    out = stratified_sample(df, ["lang", "source"], 4, "doc_id")
    got = out.collect()
    # exactly min(4, stratum size) per (lang, source)
    from collections import Counter

    sizes = Counter((r["lang"], r["source"]) for r in got)
    full = Counter((lang, src) for _, lang, src in rows)
    assert sizes == {k: min(4, v) for k, v in full.items()}
    # deterministic across runs
    again = {r["doc_id"] for r in stratified_sample(df, ["lang", "source"], 4, "doc_id").collect()}
    assert again == {r["doc_id"] for r in got}
    # a small stratum (< n) is returned whole
    tiny = stratified_sample(df.where("lang = 'fr'"), ["lang"], 100, "doc_id")
    assert tiny.count() == sum(1 for _, lang, _ in rows if lang == "fr")


def test_hash_split_deterministic_and_proportional(spark):
    from entity_linking_spark.operators.transform import hash_split

    df = spark.createDataFrame([(i,) for i in range(2000)], "id long")
    a = {r["id"]: r["split"] for r in hash_split(df, "id").collect()}
    # identical assignment on a different partitioning
    b = {r["id"]: r["split"]
         for r in hash_split(df.repartition(13), "id").collect()}
    assert a == b
    from collections import Counter
    c = Counter(a.values())
    assert abs(c["train"] / 2000 - 0.8) < 0.05
    assert abs(c["val"] / 2000 - 0.1) < 0.03
    assert abs(c["test"] / 2000 - 0.1) < 0.03
    # a different salt draws an independent assignment
    s = {r["id"]: r["split"]
         for r in hash_split(df, "id", salt="v2").collect()}
    assert s != a


def test_hash_split_validates_fractions(spark):
    import pytest as _pytest

    from entity_linking_spark.operators.transform import hash_split

    df = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError, match="sum to 1"):
        hash_split(df, "id", fractions={"a": 0.5, "b": 0.2})


def test_hash_split_saturated_fraction(spark):
    """A zero-fraction tail entry (cumulative hits 1.0 early) must not
    invert the boundary comparison."""
    from entity_linking_spark.operators.transform import hash_split

    df = spark.createDataFrame([(i,) for i in range(500)], "id long")
    got = {r["split"] for r in hash_split(
        df, "id", fractions={"all": 1.0, "none": 0.0}).collect()}
    assert got == {"all"}
