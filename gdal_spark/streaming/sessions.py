"""Sessionization — gap-based event sessions, batch + stateful stream.

The reference is a batch engine with no event streams (SURVEY.md
§2.11), so this operator belongs to the engine's "beyond the
reference" training-pipeline scope: grouping user event streams into
sessions (maximal chains with inter-event gap ≤ ``gap_s``) is the
canonical custom *stateful* streaming operator.

Two synchronized implementations:

- ``sessionize`` (batch): pure-SQL gaps-and-islands — ``lag`` over
  (user, time) → new-session flag → running sum = session id →
  groupBy. Fully ANSI-expressible, so the driver oracle checks it
  value-exactly. Deterministic: time ties break by event_id.
- ``sessionize_stream``: ``applyInPandasWithState`` with a per-user
  open-session state, an event-time watermark (``gap_s`` seconds on
  ``ts``) and an **event-time timeout** set to ``session_end + gap_s``;
  when the watermark passes it, the open session flushes. Events
  arriving out of order across micro-batches but inside the watermark
  extend the open session exactly as the batch operator would; events
  older than the watermark are dropped by Spark (the standard
  late-data contract). Single-batch (``availableNow``) output equals
  the batch operator's — asserted in pytest.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_id long, session_start_s long, session_end_s long, "
    "n_events long, sum_v double"
)


def sessionize(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Batch sessionization. Returns one row per (user, session):
    (user_id, session_id, session_start_s, session_end_s, n_events,
    sum_v)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.lag("ts").over(w).alias("_pts"),
    ).withColumn(
        "_brk",
        F.when(
            F.col("_pts").isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp("_pts") > gap_s),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.unix_timestamp(F.min("ts")).alias("session_start_s"),
        F.unix_timestamp(F.max("ts")).alias("session_end_s"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_v"),
    )


def sessionize_stream(events_stream: DataFrame, gap_s: int = 1800):
    """Stateful-streaming sessionization: per-user open-session state,
    flushed when the gap elapses (event-time timeout) or the group's
    batch slice closes it. Returns the transformed streaming frame —
    attach your own sink/trigger."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        rows = []
        for pdf in pdfs:
            rows.append(pdf[["event_id", "ts", "value"]])
        if not rows:
            if state.hasTimedOut and state.exists:
                start, end, n, sv, sid = state.get
                state.remove()
                yield pd.DataFrame(
                    [
                        {
                            "user_id": key[0],
                            "session_id": sid,
                            "session_start_s": start,
                            "session_end_s": end,
                            "n_events": n,
                            "sum_v": round(sv, 4),
                        }
                    ]
                )
            return
        ev = pd.concat(rows).sort_values(["ts", "event_id"])
        ts_s = (ev["ts"].astype("int64") // 1_000_000_000).to_numpy()
        vals = ev["value"].to_numpy()
        if state.exists:
            start, end, n, sv, sid = state.get
        else:
            start = end = None
            n = 0
            sv = 0.0
            sid = 0
        out = []
        for t, v in zip(ts_s.tolist(), vals.tolist()):
            if start is None:
                sid += 1
                start = end = t
                n = 1
                sv = float(v)
            elif t - end > gap_s:
                out.append((sid, start, end, n, sv))
                sid += 1
                start = end = t
                n = 1
                sv = float(v)
            else:
                end = t
                n += 1
                sv += float(v)
        state.update((start, end, n, sv, sid))
        # event-time timeout: flush the open session once the watermark
        # passes its gap horizon (not wall-clock — replaying history at
        # full speed times out by data time, not processing time)
        state.setTimeoutTimestamp((end + gap_s) * 1000)
        if out:
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "session_id": s,
                        "session_start_s": a,
                        "session_end_s": b,
                        "n_events": nn,
                        "sum_v": round(vv, 4),
                    }
                    for s, a, b, nn, vv in out
                ]
            )

    state_schema = "start long, end long, n long, sv double, sid long"
    return (
        events_stream.withWatermark("ts", f"{gap_s} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
