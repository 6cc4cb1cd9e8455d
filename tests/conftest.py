import os
import shutil
import tempfile

import pytest

from sits_classification_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", cores=os.environ.get("SPARK_TEST_CPUS", "8"))
    yield s


@pytest.fixture(scope="session")
def tmpdir_session():
    d = tempfile.mkdtemp(prefix="sits_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def sf001():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf01():
    return "/root/testdata/sf0.01"
