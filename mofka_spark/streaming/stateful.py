"""Custom stateful streaming operators (applyInPandasWithState).

The reference's only stateful constructs are consumer cursors and the
completion flag (SURVEY.md §2.7 "Stateful ops"); the engine's streaming
surface adds arbitrary keyed state. The canonical example implemented
here is event-time SESSIONIZATION with an inactivity gap: per-key
sessions that close either when a later event for the key arrives more
than ``gap`` after the session's end (data-driven close) or when the
watermark passes the session's timeout (event-time timeout — no more
events can extend it).

Why applyInPandasWithState and not window()/session_window(): the
callback owns arbitrary per-key state and emission logic, which is the
extension point users need for custom operators (dedup-within-session,
funnel detection, per-key model state...); this module is the template.

Scale shape: state lives in Spark's per-partition state store keyed by
the group column — one shuffle per micro-batch on the key, Arrow-batched
Python execution, state size O(active keys), and the event-time timeout
+ watermark bound state growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = "start long, end long, n long"


def sessionize_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 1800,
    watermark_delay: str = "1 minute",
) -> DataFrame:
    """Closed sessions (user_id, session_start, session_end, n_events)
    from a streaming events frame. A session closes when a gap >
    ``gap_sec`` is observed for the key, or when the event-time timeout
    fires (watermark passed session_end + gap)."""
    import pandas as pd

    gap_us = gap_sec * 1_000_000

    def close_sessions(key, pdf_iter, state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [n],
                }
            )
            return
        # state timestamps are epoch MICROseconds (pd.Timestamp.value
        # is ns) — second truncation would shift session bounds off the
        # batch oracle's exact event times
        ts = []
        for pdf in pdf_iter:
            ts.extend(int(v.value) // 1000 for v in pdf[ts_col])
        ts.sort()
        cur = list(state.get) if state.exists else None
        closed: list[tuple[int, int, int]] = []
        for t in ts:
            if cur is None:
                cur = [t, t, 1]
            elif t - cur[1] > gap_us:
                closed.append(tuple(cur))
                cur = [t, t, 1]
            else:
                cur[1] = max(cur[1], t)
                cur[2] += 1
        state.update(tuple(cur))
        # close via event-time timeout once the watermark passes
        # session_end + gap (no earlier event can extend it after that).
        # Clamp to watermark+1: applyInPandasWithState does NOT drop
        # late rows, and setTimeoutTimestamp THROWS (killing the query)
        # if handed a timestamp at or before the current watermark —
        # a late event for an almost-expired session would do exactly
        # that.
        timeout_ms = cur[1] // 1000 + gap_sec * 1000
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout_ms, wm + 1))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            close_sessions,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
