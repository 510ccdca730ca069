import os
import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from gleaner_spark.session import build_session

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = build_session("gleaner-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture()
def tmp_lake():
    d = tempfile.mkdtemp(prefix="gleaner-lake-")
    yield d
    shutil.rmtree(d, ignore_errors=True)
