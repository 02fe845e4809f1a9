from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from geolake_spark.session import get_spark  # noqa: E402
from geolake_spark.sources import synth  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="geolake_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def synth_paths():
    return synth.ensure_local_tables("/root/repo/data", "0.001")


@pytest.fixture(scope="session")
def pages(spark, synth_paths):
    return spark.read.parquet(synth_paths["pages"])


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute scale-evidence tests (run by default)")
