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


GRID_AGGS = [
    "min", "max", "range", "sum", "avg", "count", "count_nan", "count_all",
    "first", "last", "std.p", "std.s", "var.p", "var.s",
]


def _one_agg(a, n_all, valid, locf):
    """One aggregator over one bucket, sequential reference semantics
    (src/compaction.c class tables; finalizeEmpty + LOCF for `last`)."""
    nv = len(valid)
    vs = [v for _, v in valid]
    # count-class aggregators validate their own sample sets (nanValueValid /
    # allValueValid, src/compaction.c:944-978) — defined even when nv == 0
    if a == "count_nan":
        return float(n_all - nv)
    if a == "count_all":
        return float(n_all)
    if nv == 0:
        if a in ("sum", "count"):
            return 0.0
        if a == "last":
            return locf if locf is not None else NAN
        return NAN
    if a == "min":
        return min(vs)
    if a == "max":
        return max(vs)
    if a == "range":
        return max(vs) - min(vs)
    if a == "sum":
        return math.fsum(vs)
    if a == "avg":
        return math.fsum(vs) / nv
    if a == "count":
        return float(nv)
    if a == "first":
        return min(valid)[1]
    if a == "last":
        return max(valid)[1]
    mean = math.fsum(vs) / nv
    var_p = math.fsum((x - mean) ** 2 for x in vs) / nv
    if a == "var.p":
        return var_p
    if a == "std.p":
        return math.sqrt(var_p)
    if nv == 1:
        return 0.0  # src/compaction.c:503-516
    var_s = var_p * nv / (nv - 1)
    return var_s if a == "var.s" else math.sqrt(var_s)


def _range_oracle(rows, *, start, end, fts=None, fval=None, aggs=None,
                  dur=None, align=0, bucket_ts="-", empty=False,
                  rev=False, count=None):
    """Sequential TS.RANGE simulation: the full RangeArgs option grid
    (src/tsdb.c:1363-1426 pipeline; src/filter_iterator.c bucketizer)."""
    sel = [(t, v) for t, v in rows if start <= t <= end]
    if fts is not None:
        s = set(fts)
        sel = [(t, v) for t, v in sel if t in s]
    if fval is not None:
        lo, hi = fval
        sel = [(t, v) for t, v in sel if not math.isnan(v) and lo <= v <= hi]
    sel.sort()
    if aggs is None:
        out = [(t, (v,)) for t, v in sel]
        if rev:
            out = out[::-1]
        return out[:count] if count is not None else out
    buckets: dict[int, list] = {}
    for t, v in sel:
        # group on the UNCLAMPED grid (CalcBucketStart); clamp only at report
        # (BucketStartNormalize) — mirrors functions/buckets.py
        b = t - (t - align) % dur
        buckets.setdefault(b, []).append((t, v))
    if not buckets:
        return []
    bks = sorted(buckets)
    spine = list(range(bks[0], bks[-1] + 1, dur)) if empty else bks
    shift = {"-": 0, "~": dur // 2, "+": dur}[bucket_ts]
    out, locf = [], None
    for b in spine:
        samples = buckets.get(b, [])
        valid = [(t, v) for t, v in samples if not math.isnan(v)]
        # validSamplesInBucket is per-aggregator (src/filter_iterator.c:1280-1291):
        # a bucket emits iff ANY requested agg validates >=1 sample — count_nan
        # validates NaN samples (nanValueValid), count_all validates every
        # sample, everything else validates non-NaN samples.
        def sees(a):
            if a == "count_nan":
                return len(samples) - len(valid) > 0
            if a == "count_all":
                return len(samples) > 0
            return len(valid) > 0
        if not empty and not any(sees(a) for a in aggs):
            continue
        out.append(
            (max(b, 0) + shift, tuple(_one_agg(a, len(samples), valid, locf) for a in aggs))
        )
        if valid:
            locf = max(valid)[1]
    if rev:
        out = out[::-1]
    return out[:count] if count is not None else out


@settings(
    max_examples=14,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_range_grid_matches_oracle(spark, data):
    """The reference's differential pattern (tests/flow/test_ts_nrange_compare.py)
    over the whole option grid: random series × [filters] × [aggs] × align ×
    buckettimestamp × empty × rev × count vs the sequential oracle."""
    n = data.draw(st.integers(1, 50))
    tss = sorted(data.draw(st.sets(st.integers(0, 60_000), min_size=n, max_size=n)))
    vals = [data.draw(value_st) for _ in tss]
    rows = list(zip(tss, vals))

    start = data.draw(st.integers(0, 30_000))
    end = data.draw(st.integers(start, 70_000))
    fts = (
        data.draw(st.lists(st.sampled_from(tss), min_size=1, max_size=20))
        if data.draw(st.booleans())
        else None
    )
    fval = (-5e5, 5e5) if data.draw(st.booleans()) else None
    rev = data.draw(st.booleans())
    count = data.draw(st.one_of(st.none(), st.integers(1, 8)))

    if data.draw(st.booleans()):
        aggs = data.draw(
            st.lists(st.sampled_from(GRID_AGGS), min_size=1, max_size=4, unique=True)
        )
        dur = data.draw(st.integers(1, 15_000))
        align = data.draw(st.integers(0, 2 * dur))
        bucket_ts = data.draw(st.sampled_from(["-", "~", "+"]))
        empty = data.draw(st.booleans())
    else:
        aggs = dur = None
        align, bucket_ts, empty = 0, "-", False

    df = spark.createDataFrame(
        [("k", int(t), float(v)) for t, v in rows],
        "key string, ts long, value double",
    )
    res = ts_range(
        df, start, end, keys="k",
        filter_by_ts=fts, filter_by_value=fval,
        aggregations=aggs, bucket_dur=dur, align=align,
        bucket_ts=bucket_ts, empty=empty, rev=rev, count=count,
    ).collect()
    got = [(r[1], tuple(r[2:])) for r in res]
    exp = _range_oracle(
        rows, start=start, end=end, fts=fts, fval=fval, aggs=aggs,
        dur=dur, align=align, bucket_ts=bucket_ts, empty=empty,
        rev=rev, count=count,
    )
    ctx = dict(start=start, end=end, fts=fts, fval=fval, aggs=aggs, dur=dur,
               align=align, bucket_ts=bucket_ts, empty=empty, rev=rev, count=count)
    assert len(got) == len(exp), (ctx, got, exp)
    for (gts, gvs), (ets, evs) in zip(got, exp):
        assert gts == ets, (ctx, got, exp)
        for gv, ev in zip(gvs, evs):
            assert feq(gv, ev, tol=1e-7), (ctx, gts, gv, ev)


def _reduce_oracle(vals: list[float], reduce: str) -> float:
    """Cross-series per-timestamp reducer (MultiSeriesReduce semantics:
    NaN values are invalid, all-NaN -> NaN, count-family -> count of valid —
    src/multiseries_agg_dup_sample_iterator.c:17-66)."""
    valid = [v for v in vals if not math.isnan(v)]
    if reduce == "count":
        return float(len(valid))
    if not valid:
        return NAN
    if reduce == "sum":
        return math.fsum(valid)
    if reduce == "min":
        return min(valid)
    if reduce == "max":
        return max(valid)
    if reduce == "avg":
        return math.fsum(valid) / len(valid)
    mean = math.fsum(valid) / len(valid)
    return math.sqrt(math.fsum((x - mean) ** 2 for x in valid) / len(valid))  # std.p


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_groupby_reduce_matches_oracle(spark, data):
    """Random series/labels: GROUPBY label REDUCE r vs the sequential
    per-timestamp reducer (the reference's heap-merge + reduce,
    src/resultset.c:160-224)."""
    from redistimeseries_spark.operators.multi import ts_mrange

    nkeys = data.draw(st.integers(2, 6))
    groups = [data.draw(st.sampled_from(["g0", "g1"])) for _ in range(nkeys)]
    series = {}
    rows = []
    for i in range(nkeys):
        n = data.draw(st.integers(1, 15))
        tss = data.draw(st.sets(st.integers(0, 20), min_size=n, max_size=n))
        series[i] = {t * 1000: data.draw(value_st) for t in tss}
        rows += [(f"k{i}", t, v) for t, v in series[i].items()]
    reduce = data.draw(st.sampled_from(["sum", "max", "min", "avg", "count", "std.p"]))

    samples = spark.createDataFrame(rows, "key string, ts long, value double")
    labels = spark.createDataFrame(
        [(f"k{i}", "grp", g) for i, g in enumerate(groups)],
        "key string, label string, value string",
    )
    got = {
        (r.key, r.ts): r.value
        for r in ts_mrange(
            samples, labels, ["grp=(g0,g1)"], groupby="grp", reduce=reduce
        ).collect()
    }
    exp = {}
    for g in set(groups):
        members = [i for i, gg in enumerate(groups) if gg == g]
        all_ts = sorted({t for i in members for t in series[i]})
        for t in all_ts:
            vals = [series[i][t] for i in members if t in series[i]]
            exp[(f"grp={g}", t)] = _reduce_oracle(vals, reduce)
    assert set(got) == set(exp), (groups, reduce, sorted(got), sorted(exp))
    for k in exp:
        assert feq(got[k], exp[k], tol=1e-9), (k, got[k], exp[k], reduce)


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_kept_chain_kernel_matches_sequential(data):
    """The vectorized geometric-window kept-chain (write/mutate._kept_chain)
    vs the literal per-row reference loop (src/module.c:986-1023) on random
    series, seeds, and diff thresholds — pure numpy, no Spark session."""
    from redistimeseries_spark.write.mutate import _kept_chain

    n = data.draw(st.integers(0, 200))
    ts = sorted(data.draw(st.lists(st.integers(0, 500), min_size=n, max_size=n)))
    vs = [data.draw(st.floats(-10, 10, allow_nan=False)) for _ in range(n)]
    mtd = data.draw(st.integers(0, 30))
    mvd = data.draw(st.floats(0, 5, allow_nan=False))
    seeded = data.draw(st.booleans())
    passthrough = data.draw(st.booleans())
    at = data.draw(st.integers(0, 500)) if seeded else None
    av = data.draw(st.floats(-10, 10, allow_nan=False)) if seeded else None

    t = np.asarray(ts, np.int64)
    v = np.asarray(vs, np.float64)
    got = _kept_chain(t, v, mtd, mvd, at, av, upsert_passthrough=passthrough)

    exp = np.zeros(n, dtype=bool)
    last_t, last_v = at, av
    for i in range(n):
        if passthrough and last_t is not None and ts[i] <= last_t:
            exp[i] = True  # upsert path, anchor unchanged
            continue
        if last_t is not None and (
            ts[i] - last_t <= mtd and abs(vs[i] - last_v) <= mvd
        ):
            exp[i] = False
        else:
            exp[i] = True
            last_t, last_v = ts[i], vs[i]
    assert got.tolist() == exp.tolist(), (ts, vs, mtd, mvd, at, av, passthrough)


def _bucket(ts: np.ndarray, dur: int, align: int) -> np.ndarray:
    """Raw CalcBucketStart — UNCLAMPED, as the engine's internal __bucket
    column: the TWA window of the (single possible) negative first bucket
    is [0, raw_start + dur), not [0, dur) (filter_iterator.c:984-991 passes
    BucketStartNormalize(raw) as ta but raw + dur as tb)."""
    return ts - (ts - align) % dur


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
    # reported keys are BucketStartNormalize(raw) — clamp for comparison
    exp = {max(int(k), 0): x for k, x in zip(ub.tolist(), twa.tolist())}
    assert set(got) == set(exp), (sorted(got), sorted(exp))
    for bk in exp:
        assert feq(got[bk], exp[bk], tol=1e-9), (bk, got[bk], exp[bk], dur, align)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_asof_join_random_vs_sequential(spark, data):
    """ts_asof_join's union-window formulation vs the literal definition:
    for each left row, scan right for the max rts <= ts."""
    from redistimeseries_spark.operators.asof import ts_asof_join

    keys = ["a", "b"]
    def side():
        rows = []
        for k in keys:
            tss = data.draw(
                st.lists(st.integers(0, 50), min_size=0, max_size=8, unique=True)
            )
            rows += [(k, t, float(data.draw(st.integers(-5, 5)))) for t in tss]
        return rows

    lrows, rrows = side(), side()
    tol = data.draw(st.one_of(st.none(), st.integers(0, 20)))
    if not lrows:
        return
    schema = "key string, ts long, value double"
    got = {
        (r.key, r.ts): (r.right_ts, r.right_value)
        for r in ts_asof_join(
            spark.createDataFrame(lrows, schema),
            spark.createDataFrame(rrows or [("z", 0, 0.0)], schema),
            tolerance_ms=tol,
        ).collect()
        if r.key in keys
    }
    for k, t, _ in lrows:
        cand = [(rt, rv) for rk, rt, rv in rrows if rk == k and rt <= t]
        want = max(cand) if cand else None
        if want is not None and tol is not None and want[0] < t - tol:
            want = None
        assert got[(k, t)] == (want if want else (None, None)), (k, t)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_sessionize_random_vs_sequential(spark, data):
    """sessionize's lag+running-sum formulation vs the literal sequential
    definition (new session when gap > G)."""
    from redistimeseries_spark.operators.session import sessionize

    gap = data.draw(st.integers(1, 20))
    rows = []
    for k in ["a", "b"]:
        tss = sorted(
            data.draw(st.lists(st.integers(0, 100), min_size=0, max_size=12, unique=True))
        )
        rows += [(k, t, 0.0) for t in tss]
    if not rows:
        return
    got = {
        (r.key, r.ts): r.session_id
        for r in sessionize(
            spark.createDataFrame(rows, "key string, ts long, value double"), gap
        ).collect()
    }
    for k in ["a", "b"]:
        tss = sorted(t for kk, t, _ in rows if kk == k)
        sid, prev = 0, None
        for t in tss:
            if prev is None or t - prev > gap:
                sid += 1
            assert got[(k, t)] == sid, (k, t, gap)
            prev = t


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_sessionize_chunk_context_vs_key_window(spark, data):
    """The chunk-local sessionize (late round 9) ≡ the retained bare-key
    twin under FORCED TINY CHUNKS: sessions spanning chunk boundaries,
    single-sample chunks, multi-chunk silent gaps, and gaps exactly at a
    chunk edge."""
    from redistimeseries_spark.operators.session import (
        _sessionize_key_window,
        sessionize,
    )

    gap = data.draw(st.integers(1, 30))
    chunk = data.draw(st.sampled_from([8, 16, 64]))
    rows = []
    for k in ["a", "b"]:
        tss = sorted(
            data.draw(
                st.lists(
                    st.integers(0, 300), min_size=0, max_size=20, unique=True
                )
            )
        )
        rows += [(k, t, 0.0) for t in tss]
    if not rows:
        return
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    got = {
        (r.key, r.ts): r.session_id
        for r in sessionize(sdf, gap, chunk_ms=chunk).collect()
    }
    want = {
        (r.key, r.ts): r.session_id
        for r in _sessionize_key_window(sdf, gap).collect()
    }
    assert got == want, (gap, chunk)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_incrby_chunk_context_vs_key_window(spark, data):
    """The chunk-local incrby running sum (late round 9) ≡ the retained
    bare-key twin under FORCED TINY SEQ CHUNKS (float drift bounded by
    summation reorder — compared at 1e-9)."""
    from redistimeseries_spark.write.mutate import (
        _incrby_key_window,
        incrby,
    )

    chunk = data.draw(st.sampled_from([2, 4, 16]))
    rows = []
    for k in ["a", "b"]:
        n = data.draw(st.integers(0, 25))
        for i in range(n):
            rows.append(
                (k, i * 10, data.draw(
                    st.floats(-50, 50, allow_nan=False, width=32)
                ), i)
            )
    if not rows:
        return
    sdf = spark.createDataFrame(
        rows, "key string, ts long, value double, seq long"
    )
    got = {
        (r.key, r.ts): r.value
        for r in incrby(sdf, chunk=chunk).collect()
    }
    want = {
        (r.key, r.ts): r.value
        for r in _incrby_key_window(sdf).collect()
    }
    assert got.keys() == want.keys()
    for kk in got:
        assert abs(got[kk] - want[kk]) < 1e-9, (kk, got[kk], want[kk])


def test_incrby_integer_deltas_keep_schema(spark):
    """Integer-typed deltas: the chunked incrby must carry sum(value)'s
    own type through the cross-chunk coalesce — a 0.0 double literal
    widened the schema vs the twin (round-9 ADVICE finding).  Exact
    value equality too: integer summation has no reorder drift."""
    from redistimeseries_spark.write.mutate import _incrby_key_window, incrby

    rows = [("k", i * 10, (-1) ** i * (i + 1), i) for i in range(20)]
    sdf = spark.createDataFrame(
        rows, "key string, ts long, value long, seq long"
    )
    got = incrby(sdf, chunk=4)
    want = _incrby_key_window(sdf)
    assert got.schema["value"].dataType == want.schema["value"].dataType
    assert {(r.key, r.ts): r.value for r in got.collect()} == {
        (r.key, r.ts): r.value for r in want.collect()
    }
