"""JSONL source parity (SURVEY.md §2.1 S1-S3): schema-explicit reads,
per-corpus provenance from filenames, pretty-JSON round trip."""

import json
import os

from entity_linking_spark.sources.jsonl import (
    DOCUMENT_JSON_SCHEMA,
    read_documents_jsonl,
    read_mentions_jsonl,
    read_pretty_json,
    write_jsonl,
)


def test_documents_jsonl_with_corpus_from_filename(spark, tmp_path):
    d = tmp_path / "documents"
    d.mkdir()
    for corpus, docs in {
        "falcon_wiki": [{"document_id": "d1", "title": "A", "text": "aa"}],
        "harbor_wiki": [{"document_id": "d2", "title": "B", "text": "bb"},
                        {"document_id": "d3", "title": "C", "text": "cc"}],
    }.items():
        with open(d / f"{corpus}.json", "w") as f:
            for doc in docs:
                f.write(json.dumps(doc) + "\n")
    (d / "ignore.txt").write_text("not json")

    df = read_documents_jsonl(spark, str(d))
    rows = {r["document_id"]: r["corpus"] for r in df.collect()}
    assert rows == {"d1": "falcon_wiki", "d2": "harbor_wiki", "d3": "harbor_wiki"}


def test_mentions_jsonl_and_jsonl_roundtrip(spark, tmp_path):
    p = tmp_path / "mentions.json"
    recs = [
        {"mention_id": "m1", "context_document_id": "d1",
         "label_document_id": "d9", "corpus": "c", "text": "t",
         "start_index": 3, "end_index": 5, "category": "x"},
    ]
    with open(p, "w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    df = read_mentions_jsonl(spark, str(p))
    got = df.collect()[0]
    assert (got["mention_id"], got["start_index"], got["end_index"]) == ("m1", 3, 5)

    out = str(tmp_path / "out")
    write_jsonl(df, out)
    back = read_mentions_jsonl(spark, out)
    assert [tuple(r) for r in back.collect()] == [tuple(r) for r in df.collect()]


def test_pretty_json(spark, tmp_path):
    p = tmp_path / "pretty.json"
    p.write_text(json.dumps(
        [{"document_id": "d1", "title": "T", "text": "body"}], indent=2
    ))
    df = read_pretty_json(spark, str(p), DOCUMENT_JSON_SCHEMA)
    assert df.collect()[0]["title"] == "T"
