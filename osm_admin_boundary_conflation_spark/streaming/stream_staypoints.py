"""Stateful streaming stay-point detection (the trajectory analogue of
stream_sessions).

Batch analogue: queries.q_staypoint_detect — split each user's fix
stream where the Chebyshev jump from the previous fix exceeds JUMP,
keep segments with >= MIN_PTS fixes spanning >= MIN_DUR_US. Here the
split happens STATEFULLY across micro-batches: per-user state carries
the open segment (start/last timestamps, last fix coordinates, count,
exact integer coordinate sums); a segment is emitted the moment a new
fix arrives beyond JUMP — a purely SPATIAL close, so no timeout
machinery is involved and each user's final open segment is never
emitted (the closed-form contract the oracle states). Results depend
only on event order, never wall clock.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

JUMP = 50
MIN_PTS = 3
MIN_DUR_US = 60_000_000

OUT_SCHEMA = (
    "user_id bigint, start_us bigint, end_us bigint, n_pts bigint, "
    "sum_x bigint, sum_y bigint"
)
STATE_SCHEMA = (
    "start_us bigint, last_us bigint, last_px bigint, last_py bigint, "
    "n bigint, sum_x bigint, sum_y bigint"
)


def _fold_group(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id = key[0]
    rows = []
    for pdf in pdfs:
        us = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
        rows.extend(
            zip(us.tolist(), pdf["event_id"].tolist(), pdf["px"].tolist(), pdf["py"].tolist())
        )
    if not rows:
        return
    rows.sort()  # (us, event_id) — the batch-side window order
    if state.exists:
        start_us, last_us, last_px, last_py, n, sum_x, sum_y = state.get
    else:
        start_us = last_us = last_px = last_py = None  # type: ignore[assignment]
        n = sum_x = sum_y = 0
    closed: list[dict] = []
    for us, _eid, px, py in rows:
        px, py = int(px), int(py)
        if start_us is not None and max(abs(px - last_px), abs(py - last_py)) > JUMP:
            if n >= MIN_PTS and last_us - start_us >= MIN_DUR_US:
                closed.append(
                    {"user_id": user_id, "start_us": start_us, "end_us": last_us,
                     "n_pts": n, "sum_x": sum_x, "sum_y": sum_y}
                )
            start_us, n, sum_x, sum_y = us, 0, 0, 0
        if start_us is None:
            start_us = us
        last_us, last_px, last_py = us, px, py
        n += 1
        sum_x += px
        sum_y += py
    state.update((start_us, last_us, last_px, last_py, n, sum_x, sum_y))
    if closed:
        yield pd.DataFrame(closed)


def stream_staypoints(fixes: DataFrame) -> DataFrame:
    """fixes(user_id, ts, event_id, px, py) streaming DF → closed
    stay-point stream. Spatial closes only: state is bounded by one open
    segment per user (7 longs), and the final open segment is by
    construction never emitted."""
    return fixes.groupBy("user_id").applyInPandasWithState(
        _fold_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
