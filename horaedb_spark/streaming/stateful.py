"""Custom stateful streaming operator: per-series counter-reset-aware
cumulative ``increase`` via ``applyInPandasWithState``.

The reference's RFC declares PromQL counter semantics (``rate``/``increase``
pushed into the engine, docs/rfcs/20220702-prometheus-read-extension.md:92-95);
the batch implementations live in ``functions/promql.py``. This module is the
*streaming-native* counterpart: state (last value, row count, accumulated
increase) is keyed per series and carried across micro-batches, so a
continuously-ingesting pipeline maintains exact running counters without
re-scanning history — the Spark-idiomatic custom stateful operator the
reference's storage engine cannot express at all.

Scale design: state is one 3-long tuple per series key, hash-partitioned by
the grouping columns across executors (state-store backed, checkpointable);
per-batch work is O(rows in batch) with a vectorized numpy kernel per group.
At 100 TB / millions of series this is exactly Spark's intended shape for
``applyInPandasWithState`` — tiny per-key state, append-only input.

Determinism contract (for the DuckDB oracle gate): values are quantized to
integer milli-units with ``floor(v * 1000 + 0.5)`` — the identical float64
expression on both engines — so the accumulated sums are exact int64
arithmetic, immune to summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("increase_milli", T.LongType()),
        T.StructField("evicted", T.BooleanType()),
    ]
)

# (last quantized value, rows seen, accumulated increase in milli-units)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_vq", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("inc", T.LongType()),
    ]
)


def _make_update(idle_timeout_ms):
    def _update_increase(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # idle-series GC: emit the final snapshot, drop the state — the
            # mechanism that keeps state O(live series) on unbounded keyspaces
            last_vq, n, inc = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "event_type": [key[1]],
                    "n": [n],
                    "increase_milli": [inc],
                    "evicted": [True],
                }
            )
            return
        yield from _update_increase_live(key, pdfs, state, idle_timeout_ms)

    return _update_increase


def _update_increase_live(key, pdfs, state: GroupState, idle_timeout_ms):
    if state.exists:
        last_vq, n, inc = state.get
    else:
        last_vq, n, inc = None, 0, 0

    rows = pd.concat(list(pdfs), ignore_index=True)
    if len(rows) > 0:
        # arrival order within a batch is arbitrary; series order is (ts, id)
        rows = rows.sort_values(["ts_ms", "event_id"], kind="mergesort")
        vq = np.floor(rows["value"].to_numpy(dtype="float64") * 1000.0 + 0.5).astype(
            "int64"
        )
        prev = np.empty_like(vq)
        prev[1:] = vq[:-1]
        prev[0] = last_vq if last_vq is not None else vq[0]
        delta = np.where(vq >= prev, vq - prev, vq)
        if last_vq is None:
            delta[0] = 0  # first-ever sample opens the series, no increase
        inc += int(delta.sum())
        n += len(vq)
        last_vq = int(vq[-1])

    state.update((last_vq, n, inc))
    if idle_timeout_ms is not None:
        state.setTimeoutDuration(idle_timeout_ms)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "event_type": [key[1]],
            "n": [n],
            "increase_milli": [inc],
            "evicted": [False],
        }
    )


def stateful_increase(
    stream: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Attach the stateful increase operator to a streaming DataFrame with
    columns (user_id, event_type, ts_ms, event_id, value). Emits one running
    (n, increase_milli) row per touched series per micro-batch. With
    ``idle_timeout_ms`` set, a series untouched for that long is evicted:
    its final snapshot is emitted with ``evicted=true`` and its state is
    removed (re-appearing keys restart fresh) — state stays bounded by the
    number of LIVE series regardless of total keyspace."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy("user_id", "event_type").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        timeout,
    )
