"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 / build spec: "applyInPandasWithState for custom stateful
operators").

`running_user_totals` keeps one small state row per user (count + sum)
across micro-batches and emits the updated totals each trigger — the shape
of any incremental per-key accumulator (feature stores, rate counters,
dedup registries) that the built-in window aggregations cannot express.

Scale notes: state lives in the state store keyed by user_id (RocksDB on a
real cluster); each trigger touches only keys present in the batch.  The
processing-time timeout evicts idle keys so state is bounded — the
streaming analogue of the watermark discipline in windows.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    state.setTimeoutDuration(3600 * 1000)  # evict after 1h idle
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [s]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained in keyed state;
    emits one updated row per user per trigger.  Input: a STREAMING
    events frame with user_id and value columns."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
