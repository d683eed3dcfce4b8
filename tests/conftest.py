import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_python_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="gps-tests", parallelism=4, shuffle_partitions=4,
                  extra_conf={"spark.sql.adaptive.enabled": "false"})
    yield s
    s.stop()
