"""Custom stateful streaming operators (driver brief:
"applyInPandasWithState for custom stateful operators").

Two canonical shapes for the crawl-stream case:

- :func:`dedup_stream` — keep the FIRST occurrence of each url within
  the watermark horizon (streaming analogue of dedup_exact; Spark's
  built-in ``dropDuplicatesWithinWatermark`` bounds the state).
- :func:`running_counts` — per-key running event counts + last-seen
  timestamp via ``applyInPandasWithState``: arbitrary per-key state in
  an Arrow-batched Python function, with processing-time timeout so
  idle keys are evicted (bounded state at an unbounded stream).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("max_value", T.DoubleType(), True),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("mx", T.DoubleType(), True),
    ]
)


def dedup_stream(
    stream: DataFrame, key_col: str = "url", ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-occurrence dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; state for keys older than
    the watermark is evicted (the only way dedup state stays finite on
    an endless crawl)."""
    if not stream.isStreaming:
        raise ValueError("dedup_stream expects a streaming DataFrame")
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key_col]
    )


def _update_counts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    n, mx = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n += len(pdf)
        batch_max = pdf["value"].max() if len(pdf) else None
        if batch_max is not None:
            mx = float(batch_max) if mx is None else max(mx, float(batch_max))
    state.update((n, mx))
    state.setTimeoutDuration(60 * 60 * 1000)  # evict idle keys after 1 h
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "max_value": [mx]})


def running_counts(
    stream: DataFrame, key_col: str = "event_type", value_col: str = "value"
) -> DataFrame:
    """Per-key running (count, max) over an unbounded stream —
    applyInPandasWithState with processing-time timeouts.

    Emits one updated row per key per micro-batch (update mode)."""
    if not stream.isStreaming:
        raise ValueError("running_counts expects a streaming DataFrame")
    keyed = stream.selectExpr(
        f"CAST({key_col} AS STRING) AS key", f"CAST({value_col} AS DOUBLE) AS value"
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _update_counts,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
