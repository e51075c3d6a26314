"""Custom stateful streaming operators via applyInPandasWithState.

TS.INCRBY/TS.DECRBY (src/module.c:1469-1564) reads the series' last value
and writes last+delta — inherently stateful across micro-batches.  The
reference keeps `lastValue` on the Series struct; here the per-key state
lives in Spark's streaming state store (checkpointed, partitioned by key —
scales horizontally and survives restarts, which is the RDB persistence of
agg contexts for free).

The same template carries any custom running operator the reference's
closed command set lacks (EWMA, monotonic counters, rate()).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

INCR_OUTPUT_SCHEMA = "key string, ts long, value double"
INCR_STATE_SCHEMA = "last_ts long, last_value double"


def _incr_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_ts, last_value = state.get
    else:
        last_ts, last_value = -1, 0.0
    out_ts, out_val = [], []
    for pdf in pdfs:
        pdf = pdf.sort_values("seq")
        for ts, delta in zip(pdf["ts"], pdf["value"]):
            ts = int(ts)
            if ts < last_ts:
                continue  # reference rejects ts < last (src/module.c:1509)
            last_value = last_value + float(delta)
            last_ts = ts
            out_ts.append(ts)
            out_val.append(last_value)
    state.update((last_ts, last_value))
    yield pd.DataFrame({"key": key[0], "ts": out_ts, "value": out_val})


def incrby_stream(increments):
    """increments: streaming DF (key, ts, value=delta, seq).  Returns the
    running-counter sample stream (append mode)."""
    return increments.groupBy("key").applyInPandasWithState(
        _incr_fn,
        outputStructType=INCR_OUTPUT_SCHEMA,
        stateStructType=INCR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
