from __future__ import annotations

import pytest

from clickhouse_learning_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus="*")
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for sf, prefix in ((SF_SMOKE, "s1_"), (SF_ORACLE, "")):
        for t in (
            "region nation customer supplier part orders lineitem events documents embeddings"
        ).split():
            con.execute(
                f"CREATE VIEW {prefix}{t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
    return con
