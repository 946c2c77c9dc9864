from __future__ import annotations

import duckdb
import pytest

from mapreduce_itwiki_spark.session import get_spark
from mapreduce_itwiki_spark.sources.parquet import TABLES

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for sf, prefix in ((SF_SMALL, "small_"), (SF_ORACLE, "")):
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {prefix}{t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
    yield con
    con.close()
