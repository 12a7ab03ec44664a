"""Transform stage: denormalize mentions against document corpora.

Spark-first re-expression of reference src/transform_zeshel.py:
- the corpus dict build + per-mention lookups (':40-49', ':13-14') are two
  broadcast hash equi-joins (the documents side is the small build side,
  exactly the reference's choice of build side);
- dict key-overwrite dedup (':16', ':29-31') is dropDuplicates with an
  explicit deterministic order (the reference relies on file order; here
  a sort key makes last-write-wins reproducible under parallelism);
- the corpora union (':76-79') is unionByName + dropDuplicates.

At 100 TB the documents side stops being broadcastable: the same code path
then sort-merge-joins with AQE; callers can pre-bucket both sides on
(corpus, document_id) to eliminate the shuffle entirely.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def denormalize_mentions(
    mentions: DataFrame,
    documents: DataFrame,
    use_broadcast: bool = True,
) -> DataFrame:
    """mentions ⋈ documents on (corpus, context_document_id) and again on
    (corpus, label_document_id) → nested source_document / label_document
    structs (reference src/transform_zeshel.py:12-16)."""
    docs = documents.select(
        "corpus",
        "document_id",
        F.struct("document_id", "title", "text").alias("doc"),
    )
    if use_broadcast:
        docs = F.broadcast(docs)

    src = docs.withColumnsRenamed({"document_id": "context_document_id", "doc": "source_document"})
    lbl = docs.withColumnsRenamed({"document_id": "label_document_id", "doc": "label_document"})

    out = (
        mentions.join(src, ["corpus", "context_document_id"], "inner")
        .join(lbl, ["corpus", "label_document_id"], "inner")
    )
    return dedup_last_wins(out, ["mention_id"], order_col="mention_id")


def dedup_last_wins(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Deterministic dedup-by-key (reference dict overwrite semantics,
    src/transform_zeshel.py:16).  Uses max_by via a struct-ordering agg so
    it stays a single hash aggregation (map-side partial agg), not a
    window sort."""
    others = [c for c in df.columns if c not in keys]
    packed = F.struct(F.col(order_col).alias("__ord"), F.struct(*others).alias("__row"))
    agg = df.groupBy(*keys).agg(F.max(packed).alias("__p"))
    return agg.select(*keys, *[F.col(f"__p.__row.{c}").alias(c) for c in others])


def combine_entities(denorm_mentions: DataFrame) -> DataFrame:
    """Distinct label documents (reference src/transform_zeshel.py:27-36)."""
    ents = denorm_mentions.select(
        F.col("label_document.document_id").alias("document_id"),
        F.col("label_document.title").alias("title"),
        F.col("label_document.text").alias("text"),
    )
    return dedup_last_wins(ents, ["document_id"], order_col="document_id")


def union_corpora(*corpora: DataFrame) -> DataFrame:
    """all_docs union with last-write-wins by document_id
    (reference src/transform_zeshel.py:76-79)."""
    unioned = reduce(lambda a, b: a.unionByName(b), corpora)
    return dedup_last_wins(unioned, ["document_id"], order_col="document_id")


def tiny_split(mentions: DataFrame, n: int = 100, order_col: str = "mention_id") -> DataFrame:
    """Deterministic dev split: first n by explicit order (reference takes
    file-order head, src/transform_zeshel.py:57-63; an explicit sort makes
    it stable under partitioning)."""
    return mentions.orderBy(order_col).limit(n)


def entity_overlap_counts(a: DataFrame, b: DataFrame, key: str = "document_id") -> int:
    """Split-overlap audit (reference src/transform_zeshel.py:69-74)."""
    return a.select(key).intersect(b.select(key)).count()


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str,
) -> DataFrame:
    """Deterministic balanced sampling: exactly min(n, |stratum|) rows per
    stratum, chosen by md5-hash order of the id (engine addition — the
    training-data op behind per-language / per-source corpus balancing;
    the reference's split sampling is a file-order head, W2/W3).

    md5-of-id ordering gives a seedable-in-spirit, engine-portable
    pseudo-random total order (identical hex-string comparisons in Spark
    and ANSI SQL engines — unlike xxhash64 or rand(seed)); the id itself
    breaks md5-collision ties.  One window shuffle on the strata key;
    per-stratum top-n, not a sort of the whole stratum (Spark's window
    top-k stays a partial sort under WholeStageCodegen)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "",
    width: int = 4,
) -> DataFrame:
    """Deterministic train/val/test assignment by hash bucket — the
    reproducible replacement for ``randomSplit`` (whose assignment shifts
    with partitioning): every row lands in the same split on every run,
    engine, and repartitioning, because the bucket is a pure function of
    the id.

    The first ``width`` hex chars of md5(salt || id) partition an
    equal-probability 16^width space; cumulative-fraction thresholds are
    precomputed driver-side as fixed-width hex strings, so the
    assignment is ONE lexicographic CASE expression per row — scan
    stage, no shuffle, and portable to any SQL engine verbatim (same
    trick as ``stratified_sample``'s md5 ordering).  Change ``salt`` to
    draw a fresh independent assignment."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    space = 16 ** width
    prefix = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, width
    )
    names = list(fractions)
    cum, expr = 0.0, None
    for name in names[:-1]:
        cum += fractions[name]
        bound_int = int(cum * space)
        # a non-final cumulative of 1.0 (zero-fraction tail entries)
        # would format to width+1 hex chars ('10000'), which sorts
        # BELOW most width-char prefixes and inverts the comparison —
        # a saturated bound means "everything lands here"
        cond = (
            F.lit(True) if bound_int >= space
            else prefix < F.lit(format(bound_int, f"0{width}x"))
        )
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)
