"""Structured Streaming operators (engine additions — the reference is
pure batch, SURVEY.md §2.8; these cover the streaming-ingest side a
web-scale corpus pipeline needs: continuous page/event arrival).

Batch/stream parity: every streaming query here has the same semantics as
its batch twin in __spark_entry__ (q_events_hourly), so tests verify the
stream output against the batch computation on the same files using the
availableNow trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_event_stream(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windowed aggregation with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, key_cols: list[str], watermark: str = "2 hours") -> DataFrame:
    """Streaming exact-dedup: first event per key wins — a later event
    with the same key at a DIFFERENT event time is also dropped, as long
    as it arrives within the watermark of the first (the streaming twin
    of operators/dedup.py:exact_dedup).  dropDuplicatesWithinWatermark
    keys state on ``key_cols`` alone and expires each entry one watermark
    after its first sighting, so state stays bounded.  (The r01 version
    used dropDuplicates(key + ts), which silently deduped per (key,
    event-time) instead of per key — VERDICT r01 finding #7.)"""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(key_cols)


def _make_session_fn(gap_s: float, flush_on_timeout: bool):
    """The applyInPandasWithState update function for ``sessionize``,
    factored out so the processing-time-timeout branch is unit-testable
    with a fake GroupState (an availableNow drain never fires timeouts,
    so that branch can't be exercised end-to-end in tests — VERDICT r02
    item #8).

    Contract: ``state`` carries (session_start, last_ts, n_events,
    sum_value); a timed-out invocation flushes the open session and
    clears state; a data invocation folds the batch's rows in event-time
    order, emitting every session closed by a > gap_s silence."""
    import pandas as pd

    def fn(key, pdfs, state):
        (session_key,) = key
        if state.hasTimedOut:
            start, last, n, sv = state.get
            state.remove()
            yield pd.DataFrame({
                "session_key": [session_key],
                "session_start": [pd.Timestamp(start, unit="s")],
                "session_end": [pd.Timestamp(last, unit="s")],
                "n_events": [n], "sum_value": [sv],
            })
            return
        rows = pd.concat(list(pdfs))
        ts = rows["ts"].map(pd.Timestamp.timestamp).sort_values().to_numpy()
        vals = rows.assign(_t=rows["ts"].map(pd.Timestamp.timestamp)).sort_values("_t")
        closed = []
        if state.exists:
            start, last, n, sv = state.get
        else:
            start = last = float(ts[0]); n = 0; sv = 0.0
        for t, v in zip(vals["_t"].to_numpy(), vals["value"].to_numpy()):
            if n > 0 and t - last > gap_s:
                closed.append((start, last, n, sv))
                start, n, sv = t, 0, 0.0
            last = max(last, t) if n > 0 else t
            n += 1
            sv += float(v)
        state.update((start, last, n, sv))
        if flush_on_timeout:
            state.setTimeoutDuration(int(gap_s * 1000))
        if closed:
            yield pd.DataFrame({
                "session_key": [session_key] * len(closed),
                "session_start": [pd.Timestamp(s, unit="s") for s, _, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="s") for _, e, _, _ in closed],
                "n_events": [n_ for _, _, n_, _ in closed],
                "sum_value": [v_ for _, _, _, v_ in closed],
            })

    return fn


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    flush_on_timeout: bool = False,
) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key
    session windows closed after ``gap_minutes`` of inactivity.

    State per key: (session_start, last_ts, n_events, sum_value).
    Emits one row per CLOSED session; with ``flush_on_timeout`` open
    sessions also flush after a processing-time timeout (continuous jobs
    only — a timeout keeps availableNow drains alive forever).  This is
    the engine's example of semantics Spark's built-in windowed aggs
    can't express (variable-length, gap-based windows).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType, TimestampType,
    )

    out_schema = StructType([
        StructField("session_key", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ])
    state_schema = StructType([
        StructField("start_epoch", DoubleType()),
        StructField("last_epoch", DoubleType()),
        StructField("n", LongType()),
        StructField("sv", DoubleType()),
    ])
    fn = _make_session_fn(gap_minutes * 60.0, flush_on_timeout)

    return (
        events.withWatermark("ts", watermark)
        .withColumn("__skey", events[key_col].cast("string"))
        .groupBy("__skey")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.ProcessingTimeTimeout if flush_on_timeout
            else GroupStateTimeout.NoTimeout,
        )
    )


def sessionize_batch(
    events: DataFrame,
    key_col: str = "user_id",
    gap_minutes: int = 30,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Batch twin of ``sessionize``: gap-based session windows via window
    functions (lag → session-break flag → running sum = session id →
    group).  Emits EVERY session (the streaming operator emits only
    CLOSED ones); schema matches ``sessionize``'s output.  Fully
    SQL-expressible, so it carries the driver-oracle for the gap
    semantics the stateful streaming operator implements."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    # cast("double") keeps sub-second precision — unix_timestamp truncates
    # to whole seconds and mis-assigns events near the gap boundary; the
    # intermediate cast("timestamp") legalizes TIMESTAMP_NTZ inputs
    # (NTZ→double is not a valid cast; session TZ is UTC, session.py)
    ts_sec = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(ts_sec).over(w)
    new_sess = F.when(prev.isNull() | (ts_sec - prev > gap_s), 1).otherwise(0)
    # two explicit projections: a running sum OVER a lag-derived column is
    # a window-inside-window expression if fused into one select
    marked = events.withColumn("__new", new_sess)
    sess_id = F.sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        marked.withColumn("__sess", sess_id)
        .drop("__new")
        .groupBy(F.col(key_col).cast("string").alias("session_key"), F.col("__sess"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .drop("__sess")
    )


def run_stream_to_catalog(
    stream_df: DataFrame, catalog, name: str, checkpoint_dir: str
):
    """Drain a stream into a resumable catalog stage table
    (sources/catalog.py:foreach_batch_sink) with the availableNow
    trigger; returns the finished query."""
    q = (
        stream_df.writeStream.foreachBatch(catalog.foreach_batch_sink(name))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, query_name: str = "rollup",
    output_mode: str = "complete",
):
    """Drain all available input with the availableNow trigger into an
    in-memory sink and return the finished query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
