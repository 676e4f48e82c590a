"""Shared Spark fixture for the unit suite.

One session-scoped local[4] JVM for the whole run (startup is ~10 s;
per-test sessions would dominate the suite). Config mirrors
session.get_spark so plan behavior (AQE, UTC, Arrow, nanos flag)
matches production paths.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from outreach_etl_tool_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="unit-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
