"""Streaming hourly rollup == its batch twin (availableNow drain)."""

from pyspark.sql import functions as F

from entity_linking_spark.streaming.events import (
    hourly_rollup,
    read_event_stream,
    run_available_now,
)


def test_stream_rollup_matches_batch(spark, tmp_path):
    rows = [
        (1, "2026-01-01 00:05:00", 1, "click", 1.0),
        (2, "2026-01-01 00:55:00", 2, "click", 2.0),
        (3, "2026-01-01 01:05:00", 1, "view", 3.0),
        (4, "2026-01-01 02:59:00", 3, "click", 4.0),
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    src = str(tmp_path / "events")
    batch.write.parquet(src)

    stream = read_event_stream(spark, src, batch.schema)
    assert stream.isStreaming
    q = run_available_now(
        hourly_rollup(stream), str(tmp_path / "ckpt"), query_name="t_rollup"
    )
    got = {
        (r["hour_epoch"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("select * from t_rollup").collect()
    }
    expect = {
        (r["hour_epoch"], r["event_type"]): (r["n"], r["sum_value"])
        for r in (
            batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
            .select(
                F.unix_timestamp("w.start").alias("hour_epoch"),
                "event_type", "n", "sum_value",
            )
        ).collect()
    }
    assert got == expect
    q.stop()


def test_dedup_stream_drops_repeats(spark, tmp_path):
    from entity_linking_spark.streaming.events import dedup_stream

    rows = [
        (1, "2026-01-01 00:05:00", 1, "click", 1.0),
        (1, "2026-01-01 00:05:00", 1, "click", 1.0),   # exact repeat
        (1, "2026-01-01 00:45:00", 1, "click", 9.0),   # same key, later ts → dropped
        (2, "2026-01-01 00:06:00", 1, "click", 2.0),
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    src = str(tmp_path / "ev_dd")
    batch.write.parquet(src)
    stream = read_event_stream(spark, src, batch.schema)
    q = run_available_now(
        dedup_stream(stream, ["event_id"]), str(tmp_path / "ckpt_dd"),
        query_name="t_dd", output_mode="append",
    )
    got = sorted(r["event_id"] for r in spark.sql("select * from t_dd").collect())
    assert got == [1, 2]
    q.stop()


def test_sessionize_gap_windows(spark, tmp_path):
    """Two bursts separated by > gap for user 1 → the first burst closes
    as one session with correct bounds and aggregates."""
    from entity_linking_spark.streaming.events import sessionize

    rows = [
        (1, "2026-01-01 00:00:00", 1, "click", 1.0),
        (2, "2026-01-01 00:10:00", 1, "click", 2.0),
        (3, "2026-01-01 03:00:00", 1, "view", 5.0),   # > 30 min gap → new session
        (4, "2026-01-01 00:02:00", 2, "view", 7.0),   # user 2: single open session
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    src = str(tmp_path / "ev_sess")
    batch.write.parquet(src)
    stream = read_event_stream(spark, src, batch.schema)
    q = run_available_now(
        sessionize(stream, key_col="user_id", gap_minutes=30),
        str(tmp_path / "ckpt_sess"), query_name="t_sess", output_mode="append",
    )
    got = {
        r["session_key"]: (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from t_sess").collect()
    }
    # only user 1's first burst is CLOSED within the drained input
    assert got == {"1": (2, 3.0)}
    q.stop()


def test_sessionize_batch_matches_stream_closed_sessions(spark, tmp_path):
    """Batch sessionize_batch emits ALL sessions; the streaming operator
    emits the CLOSED subset — on shared input the closed sessions must
    agree exactly (key, bounds, aggregates)."""
    from entity_linking_spark.streaming.events import sessionize, sessionize_batch

    rows = [
        (1, "2026-01-01 00:00:00", 1, "click", 1.0),
        (2, "2026-01-01 00:10:00", 1, "click", 2.0),
        (3, "2026-01-01 03:00:00", 1, "view", 5.0),
        (4, "2026-01-01 00:02:00", 2, "view", 7.0),
        (5, "2026-01-01 04:00:00", 2, "view", 1.5),
        (6, "2026-01-01 04:10:00", 2, "view", 2.5),
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    src = str(tmp_path / "ev_sb")
    batch.write.parquet(src)
    stream = read_event_stream(spark, src, batch.schema)
    q = run_available_now(
        sessionize(stream, key_col="user_id", gap_minutes=30),
        str(tmp_path / "ckpt_sb"), query_name="t_sb", output_mode="append",
    )
    closed = {
        (r["session_key"], r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from t_sb").collect()
    }
    q.stop()
    allb = {
        (r["session_key"], r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in sessionize_batch(batch, key_col="user_id", gap_minutes=30).collect()
    }
    assert closed  # at least user 1's first burst and user 2's first event closed
    for k, v in closed.items():
        assert allb.get(k) == v, k
    # batch sees every session, incl. the open tails
    assert len(allb) == 4


def test_stream_to_catalog_stage(spark, tmp_path):
    """Streaming ingest lands in a resumable catalog stage: rows match
    the source, the manifest row count is current, and a SECOND drain of
    new files appends (stream checkpoint + stage table both survive)."""
    from entity_linking_spark.sources.catalog import Catalog
    from entity_linking_spark.streaming.events import run_stream_to_catalog

    rows = [
        (1, "2026-01-01 00:05:00", 1, "click", 1.0),
        (2, "2026-01-01 00:55:00", 2, "click", 2.0),
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    src = str(tmp_path / "ev_cat")
    batch.write.parquet(src)

    cat = Catalog(spark, str(tmp_path / "stages"))
    stream = read_event_stream(spark, src, batch.schema)
    run_stream_to_catalog(stream, cat, "events_stage", str(tmp_path / "ckpt_cat"))

    assert cat.is_complete("events_stage")
    assert cat._manifest()["events_stage"]["rows"] == 2
    assert cat.read("events_stage").count() == 2

    # new file arrives → second drain appends only the new rows
    more = spark.createDataFrame(
        [(3, "2026-01-01 01:05:00", 1, "view", 3.0)],
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    more.write.mode("append").parquet(src)
    stream2 = read_event_stream(spark, src, batch.schema)
    run_stream_to_catalog(stream2, cat, "events_stage", str(tmp_path / "ckpt_cat"))

    assert cat._manifest()["events_stage"]["rows"] == 3
    got = sorted(r["event_id"] for r in cat.read("events_stage").collect())
    assert got == [1, 2, 3]


class _FakeGroupState:
    """Minimal GroupState stand-in for unit-testing the sessionize update
    function: an availableNow drain never fires processing-time timeouts,
    so the hasTimedOut branch is unreachable end-to-end in tests
    (VERDICT r02 item #8)."""

    def __init__(self, tup=None, timed_out=False):
        self._t = tup
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._t is not None

    @property
    def get(self):
        if self._t is None:
            raise ValueError("state does not exist")
        return self._t

    def update(self, t):
        self._t = t

    def remove(self):
        self._t = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_sessionize_timeout_flushes_open_session():
    import pandas as pd

    from entity_linking_spark.streaming.events import _make_session_fn

    fn = _make_session_fn(1800.0, flush_on_timeout=True)
    st = _FakeGroupState((100.0, 500.0, 3, 7.5), timed_out=True)
    [out] = list(fn(("u1",), iter([]), st))
    assert st.removed  # open-session state cleared on flush
    assert out["session_key"].tolist() == ["u1"]
    assert out["session_start"].iloc[0] == pd.Timestamp(100.0, unit="s")
    assert out["session_end"].iloc[0] == pd.Timestamp(500.0, unit="s")
    assert out["n_events"].tolist() == [3]
    assert out["sum_value"].tolist() == [7.5]


def test_sessionize_data_batch_arms_timeout():
    import pandas as pd

    from entity_linking_spark.streaming.events import _make_session_fn

    fn = _make_session_fn(1800.0, flush_on_timeout=True)
    st = _FakeGroupState()
    rows = pd.DataFrame(
        {"ts": [pd.Timestamp(10.0, unit="s"), pd.Timestamp(20.0, unit="s")],
         "value": [1.0, 2.0]}
    )
    assert list(fn(("u1",), iter([rows]), st)) == []  # session still open
    assert st.timeout_ms == 1800 * 1000  # gap armed as the flush timeout
    start, last, n, sv = st.get
    assert (start, last, n, sv) == (10.0, 20.0, 2, 3.0)
    # without flush_on_timeout no timeout is armed (availableNow-safe)
    fn2 = _make_session_fn(1800.0, flush_on_timeout=False)
    st2 = _FakeGroupState()
    list(fn2(("u1",), iter([rows.copy()]), st2))
    assert st2.timeout_ms is None
