from __future__ import annotations

import shutil
import tempfile

import pytest

from aus_land_data_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmp_table_dir():
    d = tempfile.mkdtemp(prefix="laketbl_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
