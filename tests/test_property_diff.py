"""Property-based differentials (hypothesis) — the reference's own oracle
strategy (tests/flow/test_ts_nrange_compare.py pattern) over *random* inputs:

  * dup-policy batch fold vs the literal pairwise C simulation
    (src/generic_chunk.c:62-93) on random arrival sequences with NaNs;
  * the pure-JVM TWA plan vs the numpy kernel (same math, independently
    implemented + independently verified against DuckDB SQL in the gate)
    on random series / durations / alignments.

Values are kept non-negative in the TWA property so trapezoid areas cannot
cancel — the two engines sum in different orders, and cancellation would
turn ulp noise into unbounded relative error (negative-value cases are
covered by the fixed tests in test_empty_twa.py).
"""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import feq
from tests.test_dup_policy import fold

from redistimeseries_spark import MAX_TS, MIN_TS
from redistimeseries_spark.operators.range_query import ts_range
from redistimeseries_spark.operators.twa import _twa_kernel
from redistimeseries_spark.write.dup_policy import POLICIES, resolve_duplicates

NAN = float("nan")

value_st = st.one_of(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), st.just(NAN)
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_dup_policy_fold_random(spark, data):
    n_groups = data.draw(st.integers(1, 6))
    seqs = [
        data.draw(st.lists(value_st, min_size=1, max_size=8)) for _ in range(n_groups)
    ]
    rows = [
        (f"k{i}", 1000, float(v), j)
        for i, seq in enumerate(seqs)
        for j, v in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "key string, ts long, value double, seq long")
    for policy in POLICIES:
        got = {
            r.key: r.value for r in resolve_duplicates(df, policy).collect()
        }
        for i, seq in enumerate(seqs):
            exp = fold(policy, seq)
            assert feq(got[f"k{i}"], exp), (policy, seq, got[f"k{i}"], exp)


def _bucket(ts: np.ndarray, dur: int, align: int) -> np.ndarray:
    b = ts - (ts - align) % dur
    return np.maximum(b, 0)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_twa_jvm_matches_kernel(spark, data):
    n = data.draw(st.integers(2, 40))
    ts = sorted(
        data.draw(st.sets(st.integers(0, 100_000), min_size=n, max_size=n))
    )
    vals = [
        data.draw(
            st.one_of(
                st.floats(min_value=0.0, max_value=1e6, allow_nan=False),
                st.just(NAN),
            )
        )
        for _ in range(n)
    ]
    dur = data.draw(st.integers(1, 20_000))
    align = data.draw(st.integers(0, 2 * dur))

    df = spark.createDataFrame(
        [("k", int(t), float(v)) for t, v in zip(ts, vals)],
        "key string, ts long, value double",
    )
    got = {
        r.ts: r.twa
        for r in ts_range(
            df, aggregations=["twa"], bucket_dur=dur, align=align
        ).collect()
    }

    t = np.asarray(ts, np.int64)
    v = np.asarray(vals, np.float64)
    valid = ~np.isnan(v)
    t, v = t[valid], v[valid]
    if len(t) == 0:
        assert got == {}
        return
    b = _bucket(t, dur, align)
    ub, twa = _twa_kernel(t, v, b, dur, MIN_TS, MAX_TS)
    exp = dict(zip(ub.tolist(), twa.tolist()))
    assert set(got) == set(exp), (sorted(got), sorted(exp))
    for bk in exp:
        assert feq(got[bk], exp[bk], tol=1e-9), (bk, got[bk], exp[bk], dur, align)
