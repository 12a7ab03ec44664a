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
