"""As-of (point-in-time) join — match each left row to the latest right
row at-or-before its timestamp, per key.

No reference counterpart (the reference is a static-corpus pipeline);
this is the temporal-alignment operator a web-scale ingest needs (e.g.
join each page snapshot to the most recent crawl-policy/quote/config
row).  Spark has no ASOF join builtin, so per the engine's operator
policy this is expressed as a composition of existing DataFrame ops:

    union(left-tagged, right-tagged)
      → window last(right_payload, ignorenulls) over
        (partition by key, order by ts, right-before-left on ties)
      → keep left rows

ONE shuffle on the join key (the window sort), no per-row Python, no
range-explosion — the classic log-free alternative to exploding
time-range buckets.  Inclusive semantics (right.ts == left.ts matches),
the same as DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`,
which serves as the driver oracle.

Rows of ``right`` should be unique per (key, ts): ties inside one
timestamp have no defined winner (dedupe first — see q_asof_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join.  Output: every ``left`` row + the matched right
    payload columns (``right_ts`` and value columns, renamed with
    ``suffix`` on name clashes; NULLs when no right row precedes)."""
    if right_value_cols is None:
        skip = set(on) | {right_ts}
        right_value_cols = [c for c in right.columns if c not in skip]

    payload = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(c) for c in right_value_cols],
    )
    rtype = right.select(payload.alias("__r")).schema[0].dataType

    left_cols = [c for c in left.columns]
    lpart = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(rtype).alias("__r"),
        F.struct(*[F.col(c).alias(c) for c in left_cols]).alias("__l"),
    )
    ltype = lpart.schema["__l"].dataType
    rpart = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        payload.alias("__r"),
        F.lit(None).cast(ltype).alias("__l"),
    )

    u = lpart.unionByName(rpart)
    # right rows (__is_left=0) sort before left rows at equal __t, so an
    # exactly-simultaneous right row is visible to the left row (>= match)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))

    out_cols = [F.col(f"__l.{c}").alias(c) for c in left_cols]
    ts_out = right_ts + (suffix if right_ts in left_cols or right_ts in on else "")
    out_cols.append(F.col("__m.__rts").alias(ts_out))
    for c in right_value_cols:
        name = c + (suffix if c in left_cols else "")
        out_cols.append(F.col(f"__m.{c}").alias(name))
    return filled.where(F.col("__is_left") == 1).select(*out_cols)
