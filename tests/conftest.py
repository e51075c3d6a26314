import math
import sys

import pytest

sys.path.insert(0, "/root/repo")

from redistimeseries_spark import get_spark

NAN = float("nan")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def samples_df(spark):
    def make(rows):
        return spark.createDataFrame(rows, "key string, ts long, value double")

    return make


def feq(a, b, tol=1e-9):
    if a is None or b is None:
        return a is b
    if math.isnan(a) and math.isnan(b):
        return True
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


def rows_match(actual, expected, tol=1e-9):
    """Order-insensitive row-set compare with NaN-tolerant floats."""
    def norm(r):
        return tuple(
            round(x, 9) if isinstance(x, float) and not math.isnan(x) else (
                "NaN" if isinstance(x, float) else x
            )
            for x in r
        )

    sa = sorted(map(norm, actual))
    se = sorted(map(norm, expected))
    assert sa == se, f"\nactual:   {sa[:6]}\nexpected: {se[:6]}"
