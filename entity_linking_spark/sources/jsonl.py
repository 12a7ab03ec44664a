"""JSONL sources/sinks mirroring the reference's file formats.

The reference reads line-delimited JSON corpora and mentions
(reference src/transform_zeshel.py:41-49, :9-11) and writes pretty-JSON
dict files (':18-22'; re-read at src/zeshel_dataset.py:50-51).  Spark
equivalents: schema-explicit ``spark.read.json`` (never schema inference
on a 100 TB corpus — one pass saved and no drift), ``input_file_name``
for the per-corpus provenance the reference keeps via its directory
layout, and multiLine mode for the pretty-JSON variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# Reference record shapes (test/data/entities_train.json, mentions_train.json)
DOCUMENT_JSON_SCHEMA = StructType(
    [
        StructField("document_id", StringType(), False),
        StructField("title", StringType(), True),
        StructField("text", StringType(), True),
    ]
)

MENTION_JSON_SCHEMA = StructType(
    [
        StructField("mention_id", StringType(), False),
        StructField("context_document_id", StringType(), True),
        StructField("label_document_id", StringType(), True),
        StructField("corpus", StringType(), True),
        StructField("text", StringType(), True),
        StructField("start_index", LongType(), True),
        StructField("end_index", LongType(), True),
        StructField("category", StringType(), True),
    ]
)


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """One JSON object per line, one file per corpus; corpus name derived
    from the file name (reference keys its dict by filename stem,
    src/transform_zeshel.py:44-49)."""
    df = spark.read.schema(DOCUMENT_JSON_SCHEMA).option(
        "pathGlobFilter", "*.json"
    ).json(path)
    stem = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return df.withColumn("corpus", F.regexp_replace(stem, r"\.json$", ""))


def read_mentions_jsonl(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(MENTION_JSON_SCHEMA).json(path)


def read_pretty_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """The reference's indent=2 whole-file JSON (multiLine)."""
    return spark.read.schema(schema).option("multiLine", True).json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
