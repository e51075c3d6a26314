"""EWM smoothing compaction rules (round 11): ewma_<alpha> /
ewm_band_<alpha>_<k> — the continuous recording-rule smoothing shape
increase/rate got in round 7.  The incrementally maintained dest
(carried moment state, forward repair from the earliest touched bucket)
must equal a from-scratch batch materialization after multi-batch
ingest with out-of-order inserts, NaNs, and duplicate timestamps."""

import math
import os
import random

import pytest

from redistimeseries_spark.streaming.compaction import (
    CompactionRule,
    materialize_rule,
    parse_ewm_rule,
)
from redistimeseries_spark.streaming.ingest import StreamingStore, start_ingest

from test_streaming import drain, write_input


@pytest.fixture
def dirs(tmp_path):
    return str(tmp_path)


def _cmp(store, rule, tol=1e-9):
    got = {
        (r.key, r.ts): r.value
        for r in store.rule_table(rule, include_open=True).collect()
    }
    exp = {
        (r.key.removesuffix(rule.dest_suffix), r.ts): r.value
        for r in materialize_rule(
            store.samples(), rule, include_open=True
        ).collect()
    }
    assert got.keys() == exp.keys(), (
        sorted(got.keys() - exp.keys()), sorted(exp.keys() - got.keys())
    )
    for b in exp:
        assert abs(got[b] - exp[b]) < tol, (b, got[b], exp[b])
    return got


def test_parse_ewm_rule():
    assert parse_ewm_rule("ewma_0.3") == ("ewma", 0.3, None)
    assert parse_ewm_rule("ewm_band_0.2_3.0") == ("ewm_band", 0.2, 3.0)
    assert parse_ewm_rule("ewm_band_0.2_-2") == ("ewm_band", 0.2, -2.0)
    assert parse_ewm_rule("avg") is None
    assert parse_ewm_rule("ewma") is None
    with pytest.raises(ValueError, match="alpha"):
        parse_ewm_rule("ewma_1.0")
    with pytest.raises(ValueError, match="alpha"):
        parse_ewm_rule("ewm_band_0_2.0")
    with pytest.raises(ValueError, match="nonzero"):
        parse_ewm_rule("ewm_band_0.5_0")


def test_ewma_rule_batch_hand_case(spark):
    """Batch materialization: bucket-end EWM level, closed buckets only
    by default; NaN dropped; dup ts folds last-wins by (ts, value)."""
    rows = [
        ("k", 100, 2.0), ("k", 600, 4.0),       # bucket 0
        ("k", 600, 1.0),                         # dup -> folds to 4.0
        ("k", 1200, float("nan")),               # invalid, dropped
        ("k", 1500, 8.0),                        # bucket 1
        ("k", 2100, 6.0),                        # bucket 2 (open)
    ]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    rule = CompactionRule(None, "_ew", "ewma_0.5", 1000)
    got = {
        r.ts: r.value for r in materialize_rule(sdf, rule).collect()
    }
    # levels: 2.0 -> 0.5*4+0.5*2 = 3.0 (bucket 0 end) -> 0.5*8+0.5*3 =
    # 5.5 (bucket 1 end); bucket 2 is open -> excluded
    assert got == {0: 3.0, 1000: 5.5}
    full = {
        r.ts: r.value
        for r in materialize_rule(sdf, rule, include_open=True).collect()
    }
    assert full[2000] == pytest.approx(0.5 * 6 + 0.5 * 5.5)


def test_ewm_band_rule_batch_sides(spark):
    """ewm_band_<alpha>_<k>: k's sign selects the envelope side; the
    pair brackets the ewma level by k * EWM std."""
    rng = random.Random(0xEB11)
    rows = [("k", i * 100, 10.0 + rng.uniform(-1, 1)) for i in range(30)]
    sdf = spark.createDataFrame(rows, "key string, ts long, value double")
    up = CompactionRule(None, "_u", "ewm_band_0.3_2.0", 1000)
    dn = CompactionRule(None, "_d", "ewm_band_0.3_-2.0", 1000)
    lv = CompactionRule(None, "_m", "ewma_0.3", 1000)
    u = {r.ts: r.value for r in materialize_rule(sdf, up).collect()}
    d = {r.ts: r.value for r in materialize_rule(sdf, dn).collect()}
    m = {r.ts: r.value for r in materialize_rule(sdf, lv).collect()}
    assert u.keys() == d.keys() == m.keys() and u
    for b in u:
        assert u[b] >= m[b] >= d[b], b
        # symmetric envelope around the level
        assert (u[b] - m[b]) == pytest.approx(m[b] - d[b], abs=1e-9)


def test_ewma_rule_incremental_matches_batch(spark, dirs):
    """Multi-batch ingest with an out-of-order insert (which shifts the
    level of every later bucket), a NaN, and a duplicate-ts overwrite:
    incremental dest == from-scratch batch materialization."""
    rule = CompactionRule(None, "_ew_1s", "ewma_0.4", 1000)
    store = StreamingStore(spark, os.path.join(dirs, "store"), "last", [rule])
    write_input(
        spark, dirs,
        [("k", 100, 1.0), ("k", 900, 3.0), ("k", 1400, 5.0)], "b1",
    )
    # ooo insert into bucket 0 (changes buckets 0, 1 and beyond), a NaN,
    # a dup-ts overwrite at 1400 (policy last), and a new tail bucket
    write_input(
        spark, dirs,
        [("k", 2100, 7.0), ("k", 600, 9.0), ("k", 1700, float("nan")),
         ("k", 1400, 4.0)],
        "b2",
    )
    drain(spark, dirs, store)
    got = _cmp(store, rule)
    # hand check: resolved valid series 1(@100), 9(@600), 3(@900),
    # 4(@1400), 7(@2100); levels 1, 4.2, 3.72 | 3.832 | 5.0992
    assert got[("k", 0)] == pytest.approx(3.72)
    assert got[("k", 1000)] == pytest.approx(0.4 * 4 + 0.6 * 3.72)
    assert got[("k", 2000)] == pytest.approx(
        0.4 * 7 + 0.6 * (0.4 * 4 + 0.6 * 3.72)
    )


def test_ewm_band_rule_incremental_matches_batch(spark, dirs):
    """Band rule with an insert BEFORE the key's first sample — the
    centering origin c0 moves, exercising the no-seed full-history
    recompute path — plus a second key arriving mid-stream."""
    rule = CompactionRule(None, "_bd_1s", "ewm_band_0.3_2.0", 1000)
    store = StreamingStore(spark, os.path.join(dirs, "store"), "last", [rule])
    write_input(
        spark, dirs,
        [("k", 1000, 5.0), ("k", 1800, 6.0), ("k", 2500, 4.0)], "b1",
    )
    write_input(
        spark, dirs,
        # ts=200 precedes the key's first sample: c0 changes from 5.0
        # to 2.0, every bucket recomputes; "j" is brand-new (no seed)
        [("k", 200, 2.0), ("k", 3100, 8.0), ("j", 500, 1.0),
         ("j", 1500, 9.0)],
        "b2",
    )
    drain(spark, dirs, store)
    _cmp(store, rule)


def test_ewm_rule_fuzz_incremental_vs_batch(spark, dirs):
    """Seeded fuzzer: random multi-batch ingest (ooo across days, NaNs,
    dup timestamps under policy last) leaves the incremental dest equal
    to the from-scratch batch materialization for both rule kinds."""
    from redistimeseries_spark.streaming.ingest import DAY_MS

    rng = random.Random(0xE31)
    for trial in range(3):
        agg = "ewma_0.35" if trial % 2 == 0 else "ewm_band_0.25_1.5"
        rule = CompactionRule(None, "_ew", agg, rng.choice([1000, 2500]))
        d = os.path.join(dirs, f"f{trial}")
        os.makedirs(os.path.join(d, "in"), exist_ok=True)
        store = StreamingStore(spark, os.path.join(d, "store"), "last", [rule])
        keys = ["a", "b"]
        for b in range(3):
            rows = []
            for _ in range(rng.randint(3, 10)):
                k = rng.choice(keys)
                ts = rng.choice(
                    [rng.randint(0, 5000),
                     rng.randint(0, 5000),
                     2 * DAY_MS + rng.randint(0, 3000)]
                )
                v = rng.choice(
                    [float(rng.randint(0, 20)), float("nan")]
                )
                rows.append((k, ts, v))
            write_input(spark, d, rows, f"b{b}")
        drain(spark, d, store)
        _cmp(store, rule, tol=1e-8)


def test_ewma_rule_through_engine_facade(spark):
    """TS.CREATERULE with the round-11 `ewma_<alpha>` aggregator: the
    engine's dest materialization, LATEST open-bucket finalize, and GET
    route the smoothing rollup like any reference aggregator."""
    from redistimeseries_spark.engine import TimeSeriesEngine

    eng = TimeSeriesEngine(spark, duplicate_policy="last")
    eng.create("s")
    eng.create("s_ew")
    eng.create_rule("s", "s_ew", "ewma_0.5", 1000)
    eng.madd([("s", 0, 2.0), ("s", 500, 4.0), ("s", 1500, 8.0),
              ("s", 2100, 6.0)])
    closed = eng.range("s_ew").collect()
    assert [(r.ts, r.value) for r in closed] == [
        (0, 3.0), (1000, pytest.approx(5.5))
    ]
    assert eng.get("s_ew", latest=True) == (
        2000, pytest.approx(0.5 * 6 + 0.5 * 5.5)
    )


def test_ewm_state_table_tracks_dest(spark, dirs):
    """The carried-state table holds exactly one row per (key, emitted
    bucket) and its newest row per key reproduces the next batch's seed
    (the agg-context persistence rule for the EWM family)."""
    rule = CompactionRule(None, "_ew_1s", "ewma_0.5", 1000)
    store = StreamingStore(spark, os.path.join(dirs, "store"), "last", [rule])
    write_input(spark, dirs, [("k", 100, 2.0), ("k", 1500, 8.0)], "b1")
    write_input(spark, dirs, [("k", 2700, 4.0)], "b2")
    drain(spark, dirs, store)
    st = spark.read.parquet(store.rule_state_dir(rule))
    rows = {(r.key, r["__bucket"]): (r.c0, r.m, r.q) for r in st.collect()}
    dest = {
        (r.key, r.ts)
        for r in store.rule_table(rule, include_open=True).collect()
    }
    assert set(rows.keys()) == dest
    # ewma rules run uncentered: c0 == 0 and m IS the level
    assert all(c0 == 0.0 for (c0, _m, _q) in rows.values())
    lvl = {b: m for (k, b), (c0, m, q) in rows.items()}
    assert lvl[0] == 2.0 and lvl[1000] == 5.0 and lvl[2000] == 4.5
