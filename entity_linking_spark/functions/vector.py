"""Vector math over array<float>/array<double> columns.

Two paths, chosen by hot-path needs:
- Column-expression path (``dot``, ``l2_norm``, ``cosine``): JVM-side
  higher-order functions — right for one-off projections and small-k work.
- Arrow path (``cosine_batch_udf``): np.einsum over the whole batch — the
  fast path for the pair-scoring stage (reference scoring semantic:
  dot product, src/eval_zeshel.py:44, src/bi_encoder.py:96).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0).cast("double"), lambda acc, x: acc + x * x)
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def _to_matrix(s: pd.Series) -> np.ndarray:
    return np.array([np.asarray(x, dtype=np.float64) for x in s])


@pandas_udf(DoubleType())
def dot_batch_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    ma, mb = _to_matrix(a), _to_matrix(b)
    return pd.Series(np.einsum("ij,ij->i", ma, mb))


@pandas_udf(DoubleType())
def cosine_batch_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    ma, mb = _to_matrix(a), _to_matrix(b)
    num = np.einsum("ij,ij->i", ma, mb)
    denom = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    out = np.where(denom == 0, 0.0, num / np.where(denom == 0, 1.0, denom))
    return pd.Series(out)
