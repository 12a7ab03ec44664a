"""Streaming incremental dedup ingest: self-dedup per batch, novelty vs
the kept corpus via the signature stage, tagged-append replay safety."""

from pyspark.sql import functions as F

from entity_linking_spark.sources.catalog import Catalog
from entity_linking_spark.streaming.dedup_stream import (
    incremental_dedup_sink,
    run_dedup_ingest,
)

D_A1 = "first article about suspension bridge engineering and cables"
D_A2 = "second piece covering high speed rail electrification schemes"
D_B1 = "fresh report on geothermal district heating networks"
D_C1 = "closing essay about museum lighting restoration methods"


def _df(spark, rows):
    return spark.createDataFrame(rows, "id string, text string")


def test_sink_bootstraps_dedups_and_grows(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "stages"))
    sink = incremental_dedup_sink(cat, "id", "text", shingle_k=2, threshold=0.8)

    # batch 0 bootstraps: within-batch dup collapses to the min id
    sink(_df(spark, [("a1", D_A1), ("a2", D_A2), ("a3", D_A1)]), 0)
    kept0 = sorted(r["id"] for r in cat.read("kept_docs").collect())
    assert kept0 == ["a1", "a2"]
    assert cat._manifest()["corpus_sigs"]["rows"] == 2

    # batch 1: one dup of the corpus, one dup-pair within the batch, one novel
    sink(_df(spark, [("b1", D_A1), ("b2", D_B1), ("b3", D_B1)]), 1)
    kept1 = sorted(r["id"] for r in cat.read("kept_docs").collect())
    assert kept1 == ["a1", "a2", "b2"]

    # batch 2: dup of a doc that entered as batch 1's novel → dropped
    sink(_df(spark, [("c1", D_B1), ("c2", D_C1)]), 2)
    kept2 = sorted(r["id"] for r in cat.read("kept_docs").collect())
    assert kept2 == ["a1", "a2", "b2", "c2"]
    assert cat._manifest()["corpus_sigs"]["rows"] == 4
    assert cat._manifest()["kept_docs"]["rows"] == 4


def test_sink_replay_converges(spark, tmp_path):
    """At-least-once redelivery: replaying a fully-committed batch is a
    no-op, and replaying after a partial commit (sig files landed,
    manifest marker missing) converges to exactly one copy — the tagged
    appends overwrite the earlier attempt and the batch's own ids are
    excluded from the novelty reference."""
    import glob
    import json
    import os

    cat = Catalog(spark, str(tmp_path / "stages"))
    sink = incremental_dedup_sink(cat, "id", "text", shingle_k=2, threshold=0.8)

    sink(_df(spark, [("a1", D_A1)]), 0)
    sink(_df(spark, [("b1", D_B1), ("b2", D_A1)]), 1)
    assert sorted(r["id"] for r in cat.read("kept_docs").collect()) == ["a1", "b1"]

    # full-commit replay: no-op
    sink(_df(spark, [("b1", D_B1), ("b2", D_A1)]), 1)
    assert sorted(r["id"] for r in cat.read("kept_docs").collect()) == ["a1", "b1"]
    assert cat._manifest()["corpus_sigs"]["rows"] == 2

    # partial-commit replay: erase batch 1's completion marker (manifest)
    # while its tagged files remain on disk — the crash-between-append-
    # and-manifest shape — then redeliver
    mpath = os.path.join(str(tmp_path / "stages"), "_manifest.json")
    m = json.load(open(mpath))
    del m["corpus_sigs"]["appends"]["b1"]
    m["corpus_sigs"]["rows"] = m["corpus_sigs"]["base_rows"] + sum(
        m["corpus_sigs"]["appends"].values()
    )
    json.dump(m, open(mpath, "w"))
    assert glob.glob(os.path.join(str(tmp_path / "stages"), "corpus_sigs", "tb1-*"))

    sink(_df(spark, [("b1", D_B1), ("b2", D_A1)]), 1)
    assert sorted(r["id"] for r in cat.read("kept_docs").collect()) == ["a1", "b1"]
    assert cat.read("corpus_sigs").count() == 2
    assert cat._manifest()["corpus_sigs"]["rows"] == 2


def test_cli_dedup_ingest(spark, tmp_path, capsys):
    """cli.py dedup-ingest drains the docs dir through the sink and
    prints the stage row counts."""
    import json

    from entity_linking_spark.cli import main as cli_main

    src = str(tmp_path / "docs")
    _df(spark, [("a1", D_A1), ("a2", D_A1), ("a3", D_C1)]).write.parquet(src)
    rc = cli_main([
        "dedup-ingest", "--docs", src,
        "--workdir", str(tmp_path / "wd"),
        "--checkpoint", str(tmp_path / "ck"),
        "--shingle-k", "2", "--threshold", "0.8",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out == {"kept_docs": 2, "corpus_sigs": 2}


def test_run_dedup_ingest_end_to_end(spark, tmp_path):
    """Real availableNow stream over a parquet source dir: two drains,
    second sees only new files; kept corpus grows by novel docs only."""
    src = str(tmp_path / "docs_src")
    _df(spark, [("a1", D_A1), ("a2", D_A2)]).write.parquet(src)
    cat = Catalog(spark, str(tmp_path / "stages"))
    schema = "id string, text string"
    stream = spark.readStream.schema(schema).parquet(src)
    run_dedup_ingest(stream, cat, str(tmp_path / "ckpt"),
                     shingle_k=2, threshold=0.8)
    assert sorted(r["id"] for r in cat.read("kept_docs").collect()) == ["a1", "a2"]

    _df(spark, [("b1", D_A2), ("b2", D_B1)]).write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    run_dedup_ingest(stream2, cat, str(tmp_path / "ckpt"),
                     shingle_k=2, threshold=0.8)
    assert sorted(r["id"] for r in cat.read("kept_docs").collect()) == [
        "a1", "a2", "b2",
    ]
