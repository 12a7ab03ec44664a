"""Fixed explicit StructType schemas for every stage table.

The reference uses implicit/dynamic dicts (field access by literal key,
e.g. reference src/transform_zeshel.py:13 ``men['corpus']``); here every
table has an analysis-time schema so column resolution errors surface at
plan time, and parquet scans can prune columns (never read ``html`` binary
except in the extract stage).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EMBEDDING_DIM = 128

# North-rule input table (BASELINE.json:input_hint): Common-Crawl-style pages.
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ]
)

# ZESHEL-shaped documents (reference test/data/entities_train.json keys:
# document_id, title, text; loaded at reference src/transform_zeshel.py:41-49).
DOCUMENT_SCHEMA = StructType(
    [
        StructField("document_id", StringType(), False),
        StructField("title", StringType(), True),
        StructField("text", StringType(), True),
        StructField("corpus", StringType(), True),
    ]
)

# Mention records (reference src/transform_zeshel.py:9-16, test/data/mentions_train.json).
MENTION_SCHEMA = StructType(
    [
        StructField("mention_id", StringType(), False),
        StructField("context_document_id", StringType(), False),
        StructField("label_document_id", StringType(), True),
        StructField("corpus", StringType(), True),
        StructField("text", StringType(), False),
        StructField("start_index", LongType(), False),
        StructField("end_index", LongType(), False),
        StructField("category", StringType(), True),
    ]
)

# Fixture mentions rebased onto pages (FIXTURES.md §2).
PAGE_MENTION_SCHEMA = StructType(
    [
        StructField("mention_id", StringType(), False),
        StructField("url", StringType(), False),
        StructField("entity_id", StringType(), True),
        StructField("surface", StringType(), False),
        StructField("start_index", LongType(), False),
        StructField("end_index", LongType(), False),
        StructField("corpus", StringType(), True),
        StructField("category", StringType(), True),
    ]
)

ENTITY_SCHEMA = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("title", StringType(), False),
        StructField("text", StringType(), True),
    ]
)

EMBEDDING_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("embedding", ArrayType(FloatType()), False),
    ]
)

CANDIDATE_PAIR_SCHEMA = StructType(
    [
        StructField("mention_id", StringType(), False),
        StructField("entity_id", StringType(), False),
        StructField("blocking_key", StringType(), True),
    ]
)

SCORED_PAIR_SCHEMA = StructType(
    [
        StructField("mention_id", StringType(), False),
        StructField("entity_id", StringType(), False),
        StructField("cosine", DoubleType(), True),
        StructField("jaro_winkler", DoubleType(), True),
        StructField("lev_sim", DoubleType(), True),
        StructField("score", DoubleType(), False),
    ]
)

EDGE_SCHEMA = StructType(
    [
        StructField("src", StringType(), False),
        StructField("dst", StringType(), False),
    ]
)

CLUSTER_SCHEMA = StructType(
    [
        StructField("node", StringType(), False),
        StructField("cluster_id", StringType(), False),
    ]
)

LABELED_PAIR_SCHEMA = StructType(
    [
        StructField("mention_id_a", StringType(), False),
        StructField("mention_id_b", StringType(), False),
        StructField("blocking_key", StringType(), True),
        StructField("is_match", BooleanType(), False),
    ]
)

STAGE_METRIC_SCHEMA = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("partition_id", LongType(), False),
        StructField("rows", LongType(), False),
        StructField("snapshot_id", StringType(), False),
    ]
)
