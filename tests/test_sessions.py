"""Sessionization: batch gaps-and-islands vs stateful streaming twin."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gdal_spark.streaming.sessions import sessionize, sessionize_stream


def _events(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    # user 1: two sessions (gap 3600 > 1800 between idx 2 and 3)
    for i, off in enumerate([0, 60, 1200, 4800, 4900]):
        rows.append((1, 100 + i, base + dt.timedelta(seconds=off), float(i)))
    # user 2: one session
    for i, off in enumerate([0, 1700, 3300]):
        rows.append((2, 200 + i, base + dt.timedelta(seconds=off), 1.0))
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )


def test_batch_sessionize(spark):
    out = {
        (r.user_id, r.session_id): r for r in sessionize(_events(spark), 1800).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11 = out[(1, 1)]
    assert s11.n_events == 3 and s11.sum_v == 0.0 + 1.0 + 2.0
    assert s11.session_end_s - s11.session_start_s == 1200
    s12 = out[(1, 2)]
    assert s12.n_events == 2 and s12.sum_v == 3.0 + 4.0
    # user 2: consecutive gaps 1700/1600 both <= 1800 → one session
    assert out[(2, 1)].n_events == 3


def test_stream_sessionize_matches_batch(spark, tmp_path):
    ev = _events(spark)
    src = str(tmp_path / "events_src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        sessionize_stream(stream, gap_s=1800)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_id): r
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # append mode emits only CLOSED sessions within the batch; the
    # still-open tail session per user stays in state. user 1's first
    # session closed when its second began.
    batch = {
        (r.user_id, r.session_id): r
        for r in sessionize(ev, 1800).collect()
    }
    assert (1, 1) in got
    for k, r in got.items():
        b = batch[k]
        assert (r.session_start_s, r.session_end_s, r.n_events, r.sum_v) == (
            b.session_start_s,
            b.session_end_s,
            b.n_events,
            b.sum_v,
        ), k
