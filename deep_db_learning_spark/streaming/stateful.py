"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2.9 extension — the reference has
no streaming; this is the BASELINE.json north-star "custom stateful
operators" path).

Semantics match the batch :func:`..streaming.events.sessionize` twin: a
session closes when a user's inter-event gap exceeds ``gap_minutes``.
The stream emits a row per *closed* session; the open tail session of
each user lives in the group state and closes on a later batch (or
never, for a truly idle user — bound it with a state timeout in
production).

Scale posture: state is one tiny tuple per user (start, last, n, sum),
hash-partitioned by user_id across executors; Arrow batches carry each
group's rows. Skewed hot users stream through one state partition —
the operator is O(batch) per user, so hot keys cost I/O, not state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, sum_value double"
)
STATE_SCHEMA = "start bigint, last bigint, n int, s double"


def stream_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization over a (possibly streaming) events frame
    keyed by ``user_id`` with event-time column ``ts``."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ns = gap_minutes * 60 * 1_000_000_000  # event-time math in int64 ns

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.exists:
            start, last, n, s = state.get
        else:
            start = last = None
            n, s = 0, 0.0
        closed = []
        # the group's rows arrive as multiple Arrow chunks with no global
        # order — concatenate, then sort by event time once
        chunks = [p for p in pdf_iter if len(p)]
        if chunks:
            pdf = pd.concat(chunks).sort_values("ts")
            ts = pdf["ts"].astype("int64").to_numpy()  # ns since epoch
            vals = pdf["value"].to_numpy()
            for t, v in zip(ts, vals):
                if start is None:
                    start, last, n, s = int(t), int(t), 1, float(v)
                elif t - last > gap_ns:
                    closed.append((user_id, start, last, n, s))
                    start, last, n, s = int(t), int(t), 1, float(v)
                else:
                    last = int(t)
                    n += 1
                    s += float(v)
        if start is None:
            state.remove()
        else:
            state.update((start, last, n, s))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="ns")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="ns")
            yield out

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
