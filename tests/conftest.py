"""Shared pytest fixtures.

The pure-Python reference (wannesm/dtaidistance) imports with zero build
steps from /root/reference/src (verified in SURVEY.md §5); it is the
correctness oracle for all kernel tests (use_c=False paths only).
"""

import sys

import numpy as np
import pytest

REFERENCE_SRC = "/root/reference/src"
if REFERENCE_SRC not in sys.path:
    sys.path.insert(0, REFERENCE_SRC)


@pytest.fixture(scope="session")
def ref_dtw():
    from dtaidistance import dtw as ref_dtw_mod

    return ref_dtw_mod


@pytest.fixture(scope="session")
def ref_ed():
    from dtaidistance import ed as ref_ed_mod

    return ref_ed_mod


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def spark():
    """Session-scoped local SparkSession (local[4] keeps tests snappy)."""
    from dtaidistance_spark.session import get_spark

    s = get_spark(app_name="tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
