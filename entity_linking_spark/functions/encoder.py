"""Deterministic 128-d text encoder (the bi-encoder replacement).

The reference encodes mentions and entities into a shared 128-d space with
transformer towers + linear projections (reference src/bi_encoder.py:36-37)
and scores pairs by dot product (':96', src/eval_zeshel.py:44).  Torch is
unavailable here, so the engine preserves the *semantics* — shared 128-d
space, dot-product similarity — with a deterministic encoder:

    text → char n-grams → signed feature hashing into `dim` buckets
         → L2 normalize

Signed feature hashing preserves n-gram-profile cosine similarity in
expectation; crc32 is stable across processes/machines (unlike Python's
``hash``), so embeddings are byte-deterministic across executors and runs.

Exposed as an Arrow pandas UDF (batched, numpy inner loop over the batch's
n-grams only — no per-row Spark Python UDF).  Unique-value caching inside
the batch makes repeated entity titles nearly free.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 128
DEFAULT_NGRAM = 3


def _embed_one(text: str, dim: int, n: int) -> np.ndarray:
    v = np.zeros(dim, dtype=np.float64)
    if text:
        padded = f" {text} "  # boundary markers improve word-edge sensitivity
        g = len(padded)
        for i in range(max(g - n + 1, 1)):
            h = zlib.crc32(padded[i : i + n].encode("utf-8"))
            sign = 1.0 if (h >> 31) & 1 else -1.0
            v[h % dim] += sign
    norm = np.linalg.norm(v)
    if norm > 0:
        v /= norm
    return v


def embed_series(texts: pd.Series, dim: int = DEFAULT_DIM, n: int = DEFAULT_NGRAM) -> pd.Series:
    texts = texts.fillna("").astype(str)
    uniq, inverse = np.unique(texts.to_numpy(), return_inverse=True)
    mat = np.stack([_embed_one(t, dim, n) for t in uniq]).astype(np.float32)
    out = mat[inverse]
    return pd.Series(list(out))


def make_embed_udf(dim: int = DEFAULT_DIM, n: int = DEFAULT_NGRAM):
    @pandas_udf(ArrayType(FloatType()))
    def embed_udf(texts: pd.Series) -> pd.Series:
        return embed_series(texts, dim=dim, n=n)

    return embed_udf


def make_embed_binary_udf(dim: int = DEFAULT_DIM, n: int = DEFAULT_NGRAM):
    """Packed little-endian float32 bytes instead of array<float>.

    Binary transfer through Arrow is one contiguous buffer + one bytes
    object per row; the array<float> representation materializes a Python
    list/ndarray per row on every downstream UDF crossing AND costs boxed
    per-element evaluation in JVM higher-order functions.  The packed form
    feeds the fused pair-scoring UDF (operators/scoring.py) — unpack is a
    single np.frombuffer over the whole batch."""
    from pyspark.sql.types import BinaryType

    @pandas_udf(BinaryType())
    def embed_bin_udf(texts: pd.Series) -> pd.Series:
        embs = embed_series(texts, dim=dim, n=n)
        return embs.map(lambda v: v.tobytes())

    return embed_bin_udf


_default_embed_udf = None
_default_embed_bin_udf = None


def embed_text(col: Column | str, dim: int = DEFAULT_DIM, n: int = DEFAULT_NGRAM) -> Column:
    global _default_embed_udf
    c = F.col(col) if isinstance(col, str) else col
    if dim == DEFAULT_DIM and n == DEFAULT_NGRAM:
        if _default_embed_udf is None:
            _default_embed_udf = make_embed_udf()
        return _default_embed_udf(c)
    return make_embed_udf(dim, n)(c)


def embed_text_binary(col: Column | str, dim: int = DEFAULT_DIM, n: int = DEFAULT_NGRAM) -> Column:
    global _default_embed_bin_udf
    c = F.col(col) if isinstance(col, str) else col
    if dim == DEFAULT_DIM and n == DEFAULT_NGRAM:
        if _default_embed_bin_udf is None:
            _default_embed_bin_udf = make_embed_binary_udf()
        return _default_embed_bin_udf(c)
    return make_embed_binary_udf(dim, n)(c)
