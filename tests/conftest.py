import shutil
import tempfile

import pytest

from wned_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="wned_spark_tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setCheckpointDir(tempfile.mkdtemp(prefix="wned_ckpt_"))
    yield s


@pytest.fixture()
def tmp_warehouse():
    d = tempfile.mkdtemp(prefix="wned_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
