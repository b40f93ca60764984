import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tartare_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="tartare-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def unit_events_dir(tmp_path_factory):
    """Unit-scale change-event fixture written once per test session."""
    from tartare_spark.fixtures import UNIT, write_events_parquet

    d = tmp_path_factory.mktemp("events_unit")
    write_events_parquet(str(d), UNIT, events_per_file=500)
    return str(d)
