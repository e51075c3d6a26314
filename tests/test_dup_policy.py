"""Duplicate-policy NaN matrix (src/generic_chunk.c:62-93) — the Spark
batch fold vs a direct pairwise Python simulation of handleDuplicateSample."""

import math

import pytest

from tests.conftest import NAN, feq

from redistimeseries_spark.write.dup_policy import POLICIES, resolve_duplicates


def handle_dup(policy, old, new):
    """Literal transcription of the C pairwise merge; returns stored value."""
    one_nan = math.isnan(old) != math.isnan(new)
    if one_nan and policy in ("min", "max", "sum"):
        return old  # CR_ERR: write rejected, old value stays
    if (math.isnan(old) or math.isnan(new)) and policy != "block":
        return old if math.isnan(new) else new
    if policy == "block":
        return old  # rejected
    if policy == "first":
        return old
    if policy == "last":
        return new
    if policy == "min":
        return min(old, new)
    if policy == "max":
        return max(old, new)
    return old + new  # sum


def fold(policy, values):
    state = values[0]
    for v in values[1:]:
        state = handle_dup(policy, state, v)
    return state


SEQUENCES = [
    [1.0, 2.0],
    [2.0, 1.0, 3.0],
    [NAN, 2.0],
    [2.0, NAN],
    [NAN, NAN],
    [NAN, 2.0, NAN, 5.0],
    [3.0, NAN, 1.0],
    [1.5],
]


@pytest.mark.parametrize("policy", POLICIES)
def test_batch_fold_matches_pairwise(spark, policy):
    rows, expected = [], {}
    for i, seq in enumerate(SEQUENCES):
        key = f"k{i}"
        for j, v in enumerate(seq):
            rows.append((key, 1000, v, j))
        expected[key] = fold(policy, seq)
    df = spark.createDataFrame(rows, "key string, ts long, value double, seq long")
    out = {r.key: r.value for r in resolve_duplicates(df, policy).collect()}
    for key, exp in expected.items():
        assert feq(out[key], exp), (policy, key, out[key], exp)
