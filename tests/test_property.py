"""Property-based tests (SURVEY.md §5 item 2): the vectorized numpy
similarity kernels must agree with straightforward scalar reference
implementations on arbitrary inputs — no Spark needed, pure kernels."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from entity_linking_spark.functions.similarity import (
    WINKLER_MAX_PREFIX,
    WINKLER_PREFIX_WEIGHT,
    jaro_winkler_batch,
    levenshtein_batch,
)

TEXT = st.text(alphabet="ab cdé中", max_size=24)


def ref_levenshtein(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, lb + 1):
            cur = min(prev + (a[i - 1] != b[j - 1]), dp[j] + 1, dp[j - 1] + 1)
            prev, dp[j] = dp[j], cur
    return dp[lb]


def ref_jaro_winkler(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(max(la, lb) // 2 - 1, 0)
    b_used = [False] * lb
    matched_a, matched_b = [], []
    for i, ch in enumerate(a):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not b_used[j] and b[j] == ch:
                b_used[j] = True
                matched_a.append(ch)
                break
    matched_b = [b[j] for j in range(lb) if b_used[j]]
    m = len(matched_a)
    if m == 0:
        jaro = 0.0
    else:
        trans = sum(x != y for x, y in zip(matched_a, matched_b)) / 2.0
        jaro = (m / la + m / lb + (m - trans) / m) / 3.0
    prefix = 0
    for x, y in zip(a[:WINKLER_MAX_PREFIX], b[:WINKLER_MAX_PREFIX]):
        if x != y:
            break
        prefix += 1
    return min(jaro + prefix * WINKLER_PREFIX_WEIGHT * (1.0 - jaro), 1.0)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=20))
def test_levenshtein_batch_matches_reference(pairs):
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    got = levenshtein_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        denom = max(len(x), len(y), 1)
        exp = 1.0 if (not x and not y) else 1.0 - ref_levenshtein(x, y) / denom
        assert abs(got[i] - exp) < 1e-12, (x, y)


@settings(max_examples=300, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=20))
def test_jaro_winkler_batch_matches_reference(pairs):
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    got = jaro_winkler_batch(a, b)
    for i, (x, y) in enumerate(pairs):
        assert abs(got[i] - ref_jaro_winkler(x, y)) < 1e-9, (x, y)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=6))
def test_kernels_invariant_to_batch_composition(pairs):
    """Chunking/batching must not change any row's result."""
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    whole_jw = jaro_winkler_batch(a, b)
    whole_lev = levenshtein_batch(a, b)
    for i in range(len(pairs)):
        one_jw = jaro_winkler_batch(a.iloc[[i]].reset_index(drop=True),
                                    b.iloc[[i]].reset_index(drop=True))
        one_lev = levenshtein_batch(a.iloc[[i]].reset_index(drop=True),
                                    b.iloc[[i]].reset_index(drop=True))
        assert np.isclose(whole_jw[i], one_jw[0], atol=1e-12)
        assert np.isclose(whole_lev[i], one_lev[0], atol=1e-12)


# --- SimHash batch reduction vs scalar reference -------------------------

HASH_LISTS = st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            min_size=0,
            max_size=12,
        ),
    ),
    min_size=0,
    max_size=16,
)


@settings(max_examples=200, deadline=None)
@given(HASH_LISTS)
def test_simhash_batch_matches_scalar(rows):
    from entity_linking_spark.functions.hashing import (
        _simhash_fp_scalar,
        _simhash_reduce_batch,
    )

    got = _simhash_reduce_batch(pd.Series(rows, dtype=object))
    want = np.array([_simhash_fp_scalar(r) for r in rows], dtype=np.int64)
    assert got.tolist() == want.tolist()


# --- encoder: vectorized ASCII batch vs scalar reference ------------------

ENC_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
    min_size=0,
    max_size=24,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(ENC_TEXT, min_size=1, max_size=12), st.sampled_from([2, 3, 5]))
def test_embed_series_matches_scalar(texts, n):
    from entity_linking_spark.functions.encoder import _embed_one, embed_series

    got = embed_series(pd.Series(texts), dim=32, n=n)
    for t, g in zip(texts, got):
        want = _embed_one(t, 32, n).astype(np.float32)
        assert np.array_equal(np.asarray(g), want), repr(t)


# --- WAV PCM decode: numpy round-trip against arbitrary samples -----------

S16 = st.lists(st.integers(min_value=-32768, max_value=32767),
               min_size=0, max_size=400)


@settings(max_examples=150, deadline=None)
@given(S16, st.sampled_from([8000, 16000, 44100]), st.sampled_from([1, 2]))
def test_wav_decode_roundtrip_property(samples, rate, n_ch):
    """Any 16-bit PCM payload round-trips exactly (scaled by 2^15);
    stereo mixes down by per-frame mean; header fields are preserved."""
    import io
    import wave

    from entity_linking_spark.operators.multimodal import _decode_wav

    arr = np.array(samples, dtype="<i2")
    if n_ch == 2 and len(arr) % 2:
        arr = arr[:-1]  # whole frames only
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(arr.tobytes())
    x, got_rate, got_ch, width, n_frames = _decode_wav(buf.getvalue())
    assert (got_rate, got_ch, width) == (rate, n_ch, 2)
    assert n_frames == len(arr) // n_ch
    want = arr.astype(np.float64) / 32768.0
    if n_ch == 2:
        want = want.reshape(-1, 2).mean(axis=1)
    assert np.array_equal(x, want)


# --- repetition stats: Spark expression vs scalar Python reference --------

REP_TEXT = st.text(alphabet="ab c\t\nx", max_size=40)


def ref_dup_word_fraction(t: str) -> float:
    ws = t.lower().split()
    return 0.0 if not ws else 1.0 - len(set(ws)) / len(ws)


@settings(max_examples=30, deadline=None)
@given(st.lists(REP_TEXT, min_size=1, max_size=8))
def test_dup_word_fraction_matches_reference(spark, texts):
    from pyspark.sql import functions as F

    from entity_linking_spark.functions.quality import dup_word_fraction

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    got = {
        r["i"]: r["f"]
        for r in df.select("i", dup_word_fraction("t").alias("f")).collect()
    }
    for i, t in enumerate(texts):
        assert abs(got[i] - ref_dup_word_fraction(t)) < 1e-12, repr(t)


@settings(deadline=None, max_examples=30)
@given(
    st.integers(0, 4),                       # frames
    st.sampled_from([2, 4, 6]),              # h
    st.sampled_from([2, 4, 8]),              # w
    st.sampled_from(["420jpeg", "422", "444", "mono"]),
    st.tuples(st.integers(1, 60), st.integers(1, 2)),
    st.randoms(use_true_random=False),
)
def test_y4m_roundtrip_property(n, h, w, cspace, fps, rnd):
    from entity_linking_spark.operators.multimodal import (
        _Y4M_SUBSAMPLING, decode_y4m, encode_y4m,
    )

    dw, dh = _Y4M_SUBSAMPLING[cspace]
    cw, ch = (0, 0) if cspace == "mono" else (w // dw, h // dh)
    seed = rnd.randint(0, 2**31 - 1)
    rng = np.random.RandomState(seed)
    y = rng.randint(0, 256, (n, h, w), dtype=np.uint8)
    u = rng.randint(0, 256, (n, ch, cw), dtype=np.uint8)
    v = rng.randint(0, 256, (n, ch, cw), dtype=np.uint8)
    y2, u2, v2, fn, fd = decode_y4m(encode_y4m(y, u, v, fps=fps, cspace=cspace))
    assert (fn, fd) == fps
    assert y2.shape == y.shape and (y2 == y).all()
    assert (u2 == u).all() and (v2 == v).all()


@settings(deadline=None, max_examples=30)
@given(st.lists(st.binary(min_size=0, max_size=200), min_size=1, max_size=5),
       st.booleans())
def test_warc_roundtrip_adversarial_payloads(payloads, gz):
    """Length-prefixed framing survives payloads containing CRLF runs
    and fake record headers ('\\r\\n\\r\\nWARC/1.0') — the bytes a naive
    delimiter-scanning parser would trip on."""
    from entity_linking_spark.sources.warc import decode_warc, encode_warc

    records = [
        {"record_type": "resource", "url": f"http://ex.org/{i}",
         "warc_date": "2024-01-01T00:00:00Z", "http_headers": "",
         "payload": b"\r\n\r\nWARC/1.0\r\n" + p}
        for i, p in enumerate(payloads)
    ]
    got = decode_warc(encode_warc(records, per_record_gzip=gz))
    assert len(got) == len(records)
    for rec, orig in zip(got, records):
        assert rec["payload"] == orig["payload"]
        assert rec["url"] == orig["url"]
