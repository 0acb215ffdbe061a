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


ANOMALY_OUT_SCHEMA = (
    "event_id bigint, user_id bigint, ts timestamp, value double, "
    "roll_n bigint, roll_mean double, roll_std double, zscore double, "
    "is_anomaly boolean"
)
# the trailing window buffer + the running decimal folds (serialized as
# strings — exact decimal state survives the struct round-trip)
ANOMALY_STATE_SCHEMA = (
    "ts array<bigint>, vals array<double>, s string, ss string"
)


def stream_rolling_anomaly(
    events: DataFrame,
    window_seconds: int,
    z_threshold: float = 3.0,
    min_points: int = 5,
) -> DataFrame:
    """Streaming per-key rolling z-scores — the stateful twin of the
    batch :func:`~..operators.temporal.rolling_anomaly` (same trailing
    RANGE semantics, same decimal-fold moments, same clamp/flag rules),
    emitting one scored row per event as it arrives.

    State per user is the trailing ``window_seconds`` buffer
    (timestamps + values) PLUS the running decimal folds of value and
    value² — decimal addition is exact and invertible, so appending
    arrivals and subtracting evictions reproduces the batch fold
    bit-for-bit (the folds travel through state as strings; floats
    would re-round). Equal-timestamp rows are scored against the FULL
    tie group (the batch RANGE frame is value-determined), so ties must
    arrive within one micro-batch; rows must arrive per-key in event
    order across batches (the SCD2 stream's ordering contract — a file
    feed of time-partitioned dumps satisfies both).

    Scale posture: state is O(rows in window) per key — bounded by the
    key's event rate, never by history; hot keys cost I/O, not state.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..plans.training import _dec9_py

    span_us = int(window_seconds) * 1_000_000
    thr = float(z_threshold)
    minp = int(min_points)

    def fn(key, pdf_iter, state: GroupState):
        import math
        from decimal import Decimal

        (user_id,) = key
        if state.exists:
            ts_buf, val_buf, s_str, ss_str = state.get
            ts_buf, val_buf = list(ts_buf), list(val_buf)
            s, ss = Decimal(s_str), Decimal(ss_str)
        else:
            ts_buf, val_buf = [], []
            s, ss = Decimal(0), Decimal(0)
        chunks = [p for p in pdf_iter if len(p)]
        if not chunks:
            if ts_buf:
                state.update(
                    (ts_buf, val_buf, str(s), str(ss))
                )
            else:
                state.remove()
            return
        pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
        ts_ns = pdf["ts"].astype("int64").to_numpy()
        ts_us = ts_ns // 1000  # truncate to µs exactly like the batch op
        ids = pdf["event_id"].to_numpy()
        vals = pdf["value"].to_numpy()
        out = []
        i = 0
        n_rows = len(pdf)
        while i < n_rows:
            t = int(ts_us[i])
            j = i
            while j < n_rows and int(ts_us[j]) == t:
                j += 1
            # evict everything strictly OLDER than the frame start
            # (rangeBetween(-span, 0) is inclusive at t - span)
            while ts_buf and ts_buf[0] < t - span_us:
                gone = val_buf.pop(0)
                ts_buf.pop(0)
                s -= _dec9_py(Decimal, gone)
                ss -= _dec9_py(Decimal, gone * gone)
            # append the WHOLE tie group before scoring any of it (the
            # batch RANGE frame holds all peers)
            for k in range(i, j):
                v = float(vals[k])
                ts_buf.append(t)
                val_buf.append(v)
                s += _dec9_py(Decimal, v)
                ss += _dec9_py(Decimal, v * v)
            n = len(ts_buf)
            sd, ssd = float(s), float(ss)
            mean = sd / n
            var = max((ssd - sd * sd / n) / n, 0.0)
            std = math.sqrt(var)
            for k in range(i, j):
                v = float(vals[k])
                z = (v - mean) / std if (n >= minp and std > 0.0) else None
                flag = bool(z is not None and abs(z) >= thr)
                out.append(
                    (int(ids[k]), user_id, ts_ns[k], v, n, mean, std, z, flag)
                )
            i = j
        state.update((ts_buf, val_buf, str(s), str(ss)))
        o = pd.DataFrame(
            out,
            columns=[
                "event_id", "user_id", "ts", "value", "roll_n",
                "roll_mean", "roll_std", "zscore", "is_anomaly",
            ],
        )
        o["ts"] = pd.to_datetime(o["ts"], unit="ns")
        yield o

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=ANOMALY_OUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
