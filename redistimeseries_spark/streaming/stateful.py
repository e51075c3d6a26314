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


CUSUM_OUTPUT_SCHEMA = (
    "key string, ts long, value double, s_pos double, s_neg double,"
    " alarm boolean"
)
CUSUM_STATE_SCHEMA = "last_ts long, s_pos double, s_neg double"


def cusum_stream(samples, k: float, h: float, target: float):
    """Continuous two-sided tabular CUSUM over a sample stream
    (operators/correlate.ts_cusum's streaming form — the live drift
    monitor an alerting pipeline runs on the ingest stream).  The
    per-key (s_pos, s_neg) statistics live in Spark's streaming state
    store (checkpointed, key-partitioned); each micro-batch applies its
    samples in (ts, value) order and a row with ts below the running
    maximum is DROPPED (an accumulating statistic cannot be
    retro-inserted — the incrby_stream reject-if-ts<last rule; feed the
    resolved ingest view for replay-exact history).  `target` must be
    EXPLICIT here: self-baselining on the series mean needs the full
    history, which a stream by definition does not have.

    In-batch the recurrence is vectorized by the same closed form the
    batch operator uses, seeded with the carried state: with C =
    cumsum(d) and prefix_i = min(-s_entry, C_1..C_{i-1}),
    s_i = max(0, C_i - prefix_i) — two numpy accumulates, no Python
    loop per row."""
    if k < 0:
        raise ValueError("k (slack) must be >= 0")
    if h <= 0:
        raise ValueError("h (threshold) must be positive")
    kf, hf, tf = float(k), float(h), float(target)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, sp0, sn0 = state.get
        else:
            last_ts, sp0, sn0 = -(1 << 62), 0.0, 0.0
        outs = []
        for pdf in pdfs:
            pdf = pdf[~pdf["value"].isna()]  # NaN invalid everywhere
            pdf = pdf.sort_values(["ts", "value"])
            t = pdf["ts"].to_numpy(np.int64)
            x = pdf["value"].to_numpy(np.float64)
            prior = np.maximum.accumulate(
                np.concatenate(([last_ts], t))
            )[:-1]
            keep = t >= prior
            t, x = t[keep], x[keep]
            if not len(t):
                continue
            dp = x - tf - kf
            dn = tf - x - kf
            cp = np.cumsum(dp)
            cn = np.cumsum(dn)
            pref_p = np.minimum.accumulate(
                np.concatenate(([-sp0], cp))
            )[:-1]
            pref_n = np.minimum.accumulate(
                np.concatenate(([-sn0], cn))
            )[:-1]
            # pref <= -s_entry <= 0 always, so no extra zero clamp on it
            sp = np.maximum(0.0, cp - pref_p)
            sn = np.maximum(0.0, cn - pref_n)
            last_ts = int(t[-1])
            sp0, sn0 = float(sp[-1]), float(sn[-1])
            outs.append(
                pd.DataFrame(
                    {
                        "key": key[0],
                        "ts": t,
                        "value": x,
                        "s_pos": sp,
                        "s_neg": sn,
                        "alarm": (sp > hf) | (sn > hf),
                    }
                )
            )
        state.update((last_ts, sp0, sn0))
        if outs:
            yield pd.concat(outs)
        else:
            yield pd.DataFrame(
                {
                    "key": [],
                    "ts": [],
                    "value": [],
                    "s_pos": [],
                    "s_neg": [],
                    "alarm": [],
                }
            )

    return samples.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
