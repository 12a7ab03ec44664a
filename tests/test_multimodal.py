"""Multimodal plumbing: schema, mapInPandas batching, deterministic stub."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entity_linking_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_media_features,
    frame_sample_plan,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (f"img{i:02d}", f"https://x/{i}", "image",
         bytearray((b"\x89PNG" + bytes([i]) * 64)), "image/png", 68)
        for i in range(6)
    ] + [
        ("vid01", "https://x/v", "video", bytearray(b"\x00" * 200_000), "video/mp4", 200_000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_schema_and_norm(media):
    feats = extract_media_features(media, strict=False)
    rows = feats.collect()
    assert len(rows) == 7
    for r in rows:
        assert len(r["feature"]) == FEATURE_DIM
        assert np.linalg.norm(np.array(r["feature"])) == pytest.approx(1.0, abs=1e-4)
        assert len(r["sha256"]) == 64


def test_feature_extraction_deterministic(media):
    f1 = {r["media_id"]: r["feature"] for r in extract_media_features(media).collect()}
    f2 = {
        r["media_id"]: r["feature"]
        for r in extract_media_features(media.repartition(5)).collect()
    }
    assert f1 == f2


def test_strict_mode_raises(media):
    with pytest.raises(Exception, match="(?i)NotImplemented|decode"):
        extract_media_features(media, strict=True).collect()


def test_frame_sample_plan(media):
    plan = frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    assert all(r["media_id"] == "vid01" for r in rows)
    idx = sorted(r["frame_index"] for r in rows)
    assert idx[0] == 0 and all(b - a == 10 for a, b in zip(idx, idx[1:]))
