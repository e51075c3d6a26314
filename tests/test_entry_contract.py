"""Meta-tests on the driver contract (__spark_entry__): every declared
query must carry an oracle, and the rounding map must reference real
queries — guards against a new operator landing half-wired."""

import __spark_entry__ as E


# queries the driver checks rows-only (no SQL oracle).  Empty since round
# 4: even the sequential/stateful operators (streaming dedup, sequence
# packing) replay exactly through recursive-CTE / batch-staged oracles.
ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) == set(qs) - ROWS_ONLY, (
        set(qs) - set(os_) - ROWS_ONLY,  # queries missing an oracle
        set(os_) - set(qs),  # orphaned oracles
    )


def test_round_map_targets_exist():
    qs = E.queries()
    for name in E.ROUND_MAP:
        assert name in qs, f"ROUND_MAP entry {name!r} has no query"


def test_query_names_are_prefixed():
    # ts_* = reference surface, dl_* = training-data pipeline
    for name in E.queries():
        assert name.startswith(("ts_", "dl_")), name


def test_entry_query_is_registered():
    # entry() must exercise a gated query (driver smoke == gate member)
    assert "ts_mrange_max_1h" in E.queries()
