"""Custom stateful streaming operators (C7 advanced):
``applyInPandasWithState`` — the extension point for semantics the
built-in windowed aggregates can't express.

``running_user_stats`` keeps one small state row per user (count,
sum, last-seen) and emits an updated record per micro-batch — the
shape of real-time feature pipelines (per-entity accumulators).
State is bounded: one row per active key. For continuous deployments
pass ``ttl_ms`` to evict idle keys via ProcessingTimeTimeout; leave
it ``None`` for finite (``availableNow``) runs — a pending
processing-time timeout forces the trigger to keep scheduling extra
micro-batches until the timeout fires, so an availableNow query with
a long TTL never terminates.
"""

from __future__ import annotations

import functools
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, last_ts timestamp"
STATE_SCHEMA = "n long, s double, last_ts timestamp"


def _update_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState, ttl_ms: int | None
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return iter(())
    n, s, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        mx = pdf["ts"].max()
        last_ts = mx if last_ts is None else max(last_ts, mx)
    state.update((n, s, last_ts))
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    return iter(
        [pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [s], "last_ts": [last_ts]})]
    )


def running_user_stats(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Per-user running aggregates with optional TTL-evicted state.
    Input must be a streaming DataFrame with (user_id, ts, value)."""
    timeout = (
        GroupStateTimeout.NoTimeout if ttl_ms is None else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        functools.partial(_update_user, ttl_ms=ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
