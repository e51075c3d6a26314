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

import numpy as np
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
    # accepted iff ts >= running max of prior ACCEPTED ts — which equals the
    # running max of ALL prior ts (an accepted row always raises the max to
    # itself), so the reference's reject-if-ts<last rule (src/module.c:1509)
    # vectorizes to a prefix-max mask + cumsum per Arrow chunk.
    outs = []
    for pdf in pdfs:
        pdf = pdf.sort_values("seq")
        t = pdf["ts"].to_numpy(np.int64)
        d = pdf["value"].to_numpy(np.float64)
        prior = np.maximum.accumulate(np.concatenate(([last_ts], t)))[:-1]
        keep = t >= prior
        kt = t[keep]
        kv = last_value + np.cumsum(d[keep])
        if len(kt):
            last_ts = int(max(last_ts, kt[-1]))
            last_value = float(kv[-1])
        outs.append(pd.DataFrame({"key": key[0], "ts": kt, "value": kv}))
    state.update((last_ts, last_value))
    yield pd.concat(outs) if outs else pd.DataFrame(
        {"key": [], "ts": [], "value": []}
    )


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
