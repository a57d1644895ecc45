"""Custom stateful streaming operator: session windows over the events
stream via ``applyInPandasWithState``.

The batch analogue is queries.q_events_sessionize (30-minute inactivity
gap). Here sessions close STATEFULLY across micro-batches: per-user
state carries the open session (start/end in epoch microseconds + event
count); a watermark on the event timestamp bounds state and closes
sessions whose gap has provably elapsed. Timeout handling uses
EventTimeTimeout so results depend only on event timestamps, never on
wall clock — the determinism rule every operator in this engine follows.

Late data beyond the watermark is dropped by the engine before the
state function runs (standard watermark semantics).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_US = 1800 * 1_000_000

OUT_SCHEMA = "user_id bigint, session_start_us bigint, n_events bigint, duration_us bigint"
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def _sessionize_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into the open-session
    state; emit every session that CLOSES (a >30-min gap observed, or
    the event-time timeout fired with no newer data)."""
    user_id = key[0]

    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "session_start_us": start_us, "n_events": n,
              "duration_us": last_us - start_us}]
        )
        return

    ts_us = sorted(
        int(v)
        for pdf in pdfs
        for v in (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000).tolist()
    )
    if not ts_us:
        # no rows and no timeout: nothing to fold; keep existing state
        # (and its pending timeout) untouched rather than index ts_us[0]
        return
    closed: list[dict] = []
    if state.exists:
        start_us, last_us, n = state.get
    else:
        start_us = last_us = ts_us[0]
        n = 0  # first event counted in the loop below

    for t in ts_us:
        if t - last_us > GAP_US:
            closed.append(
                {"user_id": user_id, "session_start_us": start_us, "n_events": n,
                 "duration_us": last_us - start_us}
            )
            start_us, n = t, 0
        last_us = max(last_us, t)
        n += 1
    state.update((start_us, last_us, n))
    # close the open session once event time passes last_us + gap
    state.setTimeoutTimestamp(last_us // 1000 + GAP_US // 1000)
    if closed:
        yield pd.DataFrame(closed)


def stream_sessionize(events_stream: DataFrame) -> DataFrame:
    """events(user_id, ts, ...) streaming DF → closed-session stream.

    Watermark = the session gap: once the watermark passes
    last_event + gap, the session can never be re-opened, so the
    event-time timeout emission is exact, not heuristic."""
    with_wm = events_stream.withWatermark("ts", "30 minutes")
    return with_wm.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
