from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from lagespark.session import get_spark

    s = get_spark("local[4]", app_name="lagespark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def duck():
    import duckdb

    con = duckdb.connect()
    yield con
    con.close()
