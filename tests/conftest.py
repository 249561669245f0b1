import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coronavirus_dashboard_pipeline_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        # no ANSI override: tests must see the same cast/overflow behavior
        # as production sessions (Spark 4 defaults ANSI on)
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
