"""Shared fixtures: one local SparkSession for the whole test run."""

from __future__ import annotations

import pytest

from mysql_data_quality_spark.core.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mdqs-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"create view {t} as select * from '{SF_CORRECT}/{t}.parquet'"
        )
    return con
