"""Surface-form string similarity.

- Levenshtein: Spark's built-in ``F.levenshtein`` (JVM, codegen) — never a
  Python UDF.  ``levenshtein_similarity`` normalizes to [0,1].
- Jaro-Winkler: no Spark built-in, so a *batch-vectorized* numpy
  implementation wrapped in an Arrow pandas UDF.  The inner loops run over
  string positions (≤ max length, short for titles/surfaces), while every
  operation is vectorized across the whole Arrow batch — no per-row Python
  (BASELINE.json:input_hint requirement).

Reference parity: the reference has no surface similarity (scores are pure
embedding dot products, reference src/eval_zeshel.py:44); Jaro-Winkler /
Levenshtein are north-rule additions (SURVEY.md §2.7).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

WINKLER_PREFIX_WEIGHT = 0.1
WINKLER_MAX_PREFIX = 4


def _encode_padded(strings: pd.Series, pad: int) -> tuple[np.ndarray, np.ndarray]:
    """Codepoint matrix (B, Lmax) padded with ``pad`` + length vector."""
    arrs = [np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) if s else
            np.empty(0, dtype=np.uint32) for s in strings]
    lens = np.array([len(a) for a in arrs], dtype=np.int64)
    lmax = max(1, int(lens.max()) if len(lens) else 1)
    out = np.full((len(arrs), lmax), pad, dtype=np.int64)
    for i, a in enumerate(arrs):
        out[i, : len(a)] = a
    return out, lens


JW_CHUNK = 8192


def jaro_winkler_batch(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Jaro-Winkler similarity for aligned string batches.

    Prefix boost applied unconditionally (Apache-Commons convention),
    p=0.1, max prefix 4.  Both empty → 1.0; one empty → 0.0.

    Large batches are processed in ≤JW_CHUNK-row chunks: the match-scan
    temporaries are O(rows × maxlen) bool/int matrices, and keeping a
    chunk's working set near L2/L3 size measured ~3× faster than one
    50k-row pass (which is DRAM-bound and stops scaling across cores).
    """
    a = a.fillna("").astype(str)
    b = b.fillna("").astype(str)
    batch = len(a)
    if batch == 0:
        return np.empty(0, dtype=np.float64)
    if batch > JW_CHUNK:
        out = np.empty(batch, dtype=np.float64)
        for lo in range(0, batch, JW_CHUNK):
            hi = min(lo + JW_CHUNK, batch)
            out[lo:hi] = jaro_winkler_batch(
                a.iloc[lo:hi].reset_index(drop=True),
                b.iloc[lo:hi].reset_index(drop=True),
            )
        return out

    # Distinct pad sentinels so pads never match each other or real chars.
    ca, la = _encode_padded(a, pad=-1)
    cb, lb = _encode_padded(b, pad=-2)
    lmax_a, lmax_b = ca.shape[1], cb.shape[1]

    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)

    a_matched = np.zeros((batch, lmax_a), dtype=bool)
    b_matched = np.zeros((batch, lmax_b), dtype=bool)
    j_idx = np.arange(lmax_b)[None, :]

    # Greedy match scan: loop over positions of `a` (short — title/surface
    # lengths), each step fully vectorized across the batch.
    for i in range(lmax_a):
        in_window = (j_idx >= (i - window)[:, None]) & (j_idx <= (i + window)[:, None])
        elig = (ca[:, i : i + 1] == cb) & ~b_matched & in_window
        has = elig.any(axis=1)
        first_j = np.argmax(elig, axis=1)
        a_matched[has, i] = True
        b_matched[has, first_j[has]] = True

    m = a_matched.sum(axis=1).astype(np.float64)

    # Transpositions: compact matched chars to the front (stable argsort on
    # ~matched keeps matched-first in original order), compare pairwise.
    order_a = np.argsort(~a_matched, axis=1, kind="stable")
    order_b = np.argsort(~b_matched, axis=1, kind="stable")
    ga = np.take_along_axis(ca, order_a, axis=1)
    gb = np.take_along_axis(cb, order_b, axis=1)
    width = min(lmax_a, lmax_b)
    col = np.arange(width)[None, :]
    valid = col < m[:, None]
    trans = ((ga[:, :width] != gb[:, :width]) & valid).sum(axis=1) / 2.0

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = (m / la + m / lb + (m - trans) / m) / 3.0
    jaro = np.where(m == 0, 0.0, jaro)
    both_empty = (la == 0) & (lb == 0)
    jaro = np.where(both_empty, 1.0, jaro)

    # Winkler common-prefix boost.
    pw = min(WINKLER_MAX_PREFIX, lmax_a, lmax_b)
    if pw > 0:
        prefix_eq = np.cumprod(ca[:, :pw] == cb[:, :pw], axis=1)
        prefix_len = prefix_eq.sum(axis=1).astype(np.float64)
    else:
        prefix_len = np.zeros(batch)
    jw = jaro + prefix_len * WINKLER_PREFIX_WEIGHT * (1.0 - jaro)
    return np.clip(jw, 0.0, 1.0)


def levenshtein_batch(a: pd.Series, b: pd.Series) -> np.ndarray:
    """Levenshtein *similarity* (1 - dist/max_len) for aligned batches.

    Classic DP with the row loop over positions of `a` and a sequential
    scan over positions of `b` (the insertion dependency), every step a
    vector op across the whole batch — ≈ Lmax² tiny numpy ops per batch,
    no per-row Python.  Matches Spark's builtin F.levenshtein (unit
    cost, no transposition) — used where strings live Python-side
    already (the broadcast-feature scorer) so no JVM round-trip is
    needed.  Both empty → 1.0.
    """
    a = a.fillna("").astype(str)
    b = b.fillna("").astype(str)
    B = len(a)
    if B == 0:
        return np.empty(0, dtype=np.float64)
    ca, la = _encode_padded(a, pad=-1)
    cb, lb = _encode_padded(b, pad=-2)
    La, Lb = ca.shape[1], cb.shape[1]

    out = np.where(lb == 0, 0, lb).astype(np.int32)  # rows with la == 0
    prev = np.broadcast_to(np.arange(Lb + 1, dtype=np.int32), (B, Lb + 1)).copy()
    for i in range(1, La + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = prev[:, :-1] + (ca[:, i - 1 : i] != cb).astype(np.int32)
        dele = prev[:, 1:] + np.int32(1)
        m = np.minimum(sub, dele)
        for j in range(1, Lb + 1):
            cur[:, j] = np.minimum(m[:, j - 1], cur[:, j - 1] + np.int32(1))
        done = la == i
        if done.any():
            out[done] = cur[done, lb[done]]
        prev = cur

    denom = np.maximum(np.maximum(la, lb), 1)
    sim = 1.0 - out.astype(np.float64) / denom
    return np.where((la == 0) & (lb == 0), 1.0, sim)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(jaro_winkler_batch(a, b))


def jaro_winkler(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return jaro_winkler_udf(a, b)


def levenshtein_similarity(a: Column | str, b: Column | str) -> Column:
    """1 - lev(a,b)/max(len) — JVM-side, [0,1], 1.0 for two empties."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        F.lit(1.0) - F.levenshtein(a, b) / denom
    )
